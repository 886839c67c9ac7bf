package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BandCollisionMaskSpec extends SparkSpec {
  import spark.implicits._

  private def refMask(a: Seq[Long], b: Seq[Long], rpb: Int): Long = {
    val bands = math.min(a.size, b.size) / rpb
    (0 until bands).foldLeft(0L) { (m, f) =>
      val eq = (f * rpb until (f + 1) * rpb).forall(i => a(i) == b(i))
      if (eq) m | (1L << f) else m
    }
  }

  test("mask bit f set iff every component of band f matches (vs reference)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 300).map { _ =>
      val a = Seq.fill(12)(rnd.nextInt(4).toLong)
      // collide-heavy second side: copy a, then corrupt a few slots
      val b = a.zipWithIndex.map { case (v, i) =>
        if (rnd.nextInt(3) == 0) v + 1 else v
      }
      (a, b)
    }
    for (rpb <- Seq(1, 2, 3, 4)) {
      val got = rows.toDF("a", "b")
        .select(BandCollisionMask(col("a"), col("b"), rpb).as("m"))
        .as[Long].collect()
      val want = rows.map { case (a, b) => refMask(a, b, rpb) }
      assert(got.toSeq == want, s"rpb=$rpb")
    }
  }

  test("interpreted eval equals the codegen'd path") {
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L)
    val b = Seq(1L, 2L, 9L, 4L, 5L, 6L)
    val df = Seq((a, b)).toDF("a", "b")
    val gen = df.select(BandCollisionMask(col("a"), col("b"), 2).as("m"))
      .as[Long].head()
    // a Python-style eval through nullSafeEval
    import org.apache.spark.sql.catalyst.util.ArrayData
    val interp = BandCollisionMaskImpl.compute(
      ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(b.toArray), 2)
    assert(gen == interp)
    assert(gen == 0x5L) // bands 0 and 2 collide; band 1 differs at slot 3
  }

  test("identical signatures set every band bit; disjoint set none") {
    val a = Seq.tabulate(48)(_.toLong)
    val df = Seq((a, a), (a, a.map(_ + 100))).toDF("a", "b")
    val got = df.select(BandCollisionMask(col("a"), col("b"), 4).as("m"))
      .as[Long].collect().toSeq
    assert(got == Seq((1L << 12) - 1, 0L))
  }

  test("more than 63 bands throws instead of silently truncating") {
    // a k=128/rpb=1 family would need 128 mask bits; the contract is
    // a loud fault, not a clamp that under-counts bands 64+
    val a = Seq.tabulate(128)(_.toLong)
    val df = Seq((a, a)).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(BandCollisionMask(col("a"), col("b"), 1).as("m"))
        .as[Long].head()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("band_collision_mask")),
      s"unexpected error chain: $e")
    // interpreted path faults identically
    import org.apache.spark.sql.catalyst.util.ArrayData
    val i = intercept[IllegalArgumentException] {
      BandCollisionMaskImpl.compute(
        ArrayData.toArrayData(a.toArray), ArrayData.toArrayData(a.toArray), 1)
    }
    assert(i.getMessage.contains("band_collision_mask"))
    // 63 bands exactly still fits
    val b63 = Seq.tabulate(63)(_.toLong)
    val ok = Seq((b63, b63)).toDF("a", "b")
      .select(BandCollisionMask(col("a"), col("b"), 1).as("m"))
      .as[Long].head()
    assert(ok == -1L >>> 1, "all 63 bits set for identical 63-band sigs")
  }

  test("mismatched lengths mask only the shared prefix's full bands") {
    val a = Seq(1L, 2L, 3L, 4L, 5L)
    val b = Seq(1L, 2L, 3L, 4L) // 4 shared slots -> 2 full bands at rpb=2
    val df = Seq((a, b)).toDF("a", "b")
    val got = df.select(BandCollisionMask(col("a"), col("b"), 2).as("m"))
      .as[Long].head()
    assert(got == 0x3L)
  }
}
