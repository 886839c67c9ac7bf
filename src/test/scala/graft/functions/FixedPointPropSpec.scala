package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Property (seeded-random, mirroring KeyRangeSlicerSpec style):
  * FixedPoint aggregation equals the decimal-cast formulation for any
  * data that is decimal-of-scale-≤4 rendered as double — the exactness
  * contract in the FixedPoint scaladoc. */
class FixedPointPropSpec extends SparkSpec {
  import spark.implicits._

  test("sumFixed equals sum(cast(decimal)) for random 2-decimal data incl. negatives") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val xs = List.fill(300)((rnd.nextLong() % 9999999L) / 100.0)
      val df = xs.toDF("x")
      val a = df.agg(FixedPoint.sumFixed(FixedPoint.scaled(col("x"), 4), 4).as("s"))
      val b = df.agg(sum(col("x").cast("decimal(18,4)")).cast("decimal(18,4)").as("s"))
      assert(a.collect().toSeq == b.collect().toSeq, s"seed $seed")
    }
  }

  test("full 4-decimal x 4-decimal products: single 8->4 rounding, incl. [4950,5000) boundary") {
    // boundary construction: p = 0.0001 (scaled 1), d in (0.5000, 0.5050)
    // makes the scale-8 product's fraction digits 5..8 land in
    // [4951, 4999] — exactly where an intermediate 8->6 rounding bumps
    // the value up and a single 8->4 rounding must not
    val boundary = (5001 to 5049).map(d4 => (0.0001, d4 / 10000.0))
    // plus dense random full-4-decimal operands
    val rnd = new scala.util.Random(7)
    val random = List.fill(400)((
      (math.abs(rnd.nextLong()) % 99999999L + 1L) / 10000.0, // price, 4 dec
      (math.abs(rnd.nextLong()) % 10000L) / 10000.0)) // rate, 4 dec
    Seq(boundary.toList, random, boundary.toList ++ random).foreach { xs =>
      val df = xs.toDF("p", "d")
      val a = df.agg(FixedPoint.sumFixed(
        FixedPoint.scaled(col("p"), 4) * (lit(10000L) - FixedPoint.scaled(col("d"), 4)),
        4, inputScale = 8).as("s"))
      // reference semantics: exact scale-8 decimal sum, ONE half-up cast
      val b = df.agg(
        sum(col("p").cast("decimal(18,4)") * (lit(1) - col("d").cast("decimal(18,4)")))
          .cast("decimal(18,4)").as("s"))
      assert(a.collect().toSeq == b.collect().toSeq)
    }
    // per-row divergence check (sums can mask a +1/-1 ulp pair): every
    // boundary row individually must round DOWN at the 4th decimal
    val perRow = boundary.toList.toDF("p", "d")
      .groupBy("d")
      .agg(FixedPoint.sumFixed(
        FixedPoint.scaled(col("p"), 4) * (lit(10000L) - FixedPoint.scaled(col("d"), 4)),
        4, inputScale = 8).as("s"))
      .where(col("s") =!= lit(BigDecimal(0)))
    assert(perRow.isEmpty, "a [4950,5000)-boundary product rounded up (double rounding)")
  }

  test("beyond the per-group bound the sum faults loudly instead of wrapping") {
    // 3M rows of Long.MaxValue overflow the hi-half long sum; ANSI mode
    // (Spark 4 default) must raise, never silently wrap
    val df = spark.range(3000000L).select(lit(Long.MaxValue).as("x"))
    val e = intercept[Exception] {
      df.agg(FixedPoint.sumFixed(col("x"), 4).as("s")).collect()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ").toLowerCase
    assert(chain.contains("overflow"), chain)
  }

  test("scaled product reduction equals decimal product for random price/rate pairs") {
    (1 to 6).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val xs = List.fill(200)((
        (math.abs(rnd.nextLong()) % 99999999L + 1L) / 100.0, // price, 2 dec
        (math.abs(rnd.nextLong()) % 1001L) / 10000.0)) // rate, 4 dec
      val df = xs.toDF("p", "d")
      val a = df.agg(FixedPoint.sumFixed(
        FixedPoint.scaled(col("p"), 4) * (lit(10000L) - FixedPoint.scaled(col("d"), 4)),
        4, inputScale = 8).as("s"))
      val b = df.agg(
        sum(col("p").cast("decimal(18,4)") * (lit(1) - col("d").cast("decimal(18,4)")))
          .cast("decimal(18,4)").as("s"))
      assert(a.collect().toSeq == b.collect().toSeq, s"seed $seed")
    }
  }
}
