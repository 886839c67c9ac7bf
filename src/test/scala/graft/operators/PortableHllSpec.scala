package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.text.PortableHll

class PortableHllSpec extends SparkSpec {
  import spark.implicits._

  /** Scala reference of the register/rho derivation. */
  private def refRegisterRho(term: String): (Long, Long) = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(term.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString.take(15)
    val h = java.lang.Long.parseLong(hex, 16)
    val w = h >>> 9
    val rho = if (w == 0L) 52L else 52L - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (h & 511L, rho)
  }

  test("register and rho match the byte-level reference") {
    val terms = Seq("alpha", "beta gamma delta", "", "x y z w v", "Zebra 42")
    val df = terms.toDF("term")
    val (reg, rho) = PortableHll.registerRho(col("term"))
    val got = df.select(col("term"), reg.as("r"), rho.as("q")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    terms.foreach { t => assert(got(t) == refRegisterRho(t), s"term '$t'") }
  }

  test("sketch is duplicate-insensitive and bounded by m per group") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val terms = docs.select(col("source"),
      explode(PortableHll.grams(col("text"))).as("term"))
    val once = PortableHll.registers(terms, col("term"), Seq("source"))
    val twice = PortableHll.registers(
      terms.union(terms), col("term"), Seq("source"))
    assert(once.exceptAll(twice).isEmpty && twice.exceptAll(once).isEmpty,
      "duplicating the stream changed the sketch")
    val overM = once.groupBy("source").count()
      .where(col("count") > PortableHll.m).count()
    assert(overM == 0L)
  }

  test("shard sketches merge losslessly (register-wise max)") {
    val docs = graft.Tables.load(spark, sf0001, "documents")
    val out = PortableHll.mergeProfile(docs, col("text")).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("merge_exact"),
        s"merge diverged for source ${r.getAs[String]("source")}")
      assert(r.getAs[Long]("merged_s") == r.getAs[Long]("whole_s"))
    }
  }

  test("overlap sketch bounds inclusion-exclusion error by the union") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    val out = PortableHll.overlapProfile(docs, col("text"), unionRelBound = 0.15)
      .collect()
    // all source pairs present (20 sources -> 190 ordered pairs)
    assert(out.length == 190, s"expected 190 pairs, got ${out.length}")
    out.foreach { r =>
      assert(r.getAs[Boolean]("within"),
        s"${r.getAs[String]("source_a")}x${r.getAs[String]("source_b")}: " +
          s"est ${r.getAs[Double]("est_inter")} vs exact ${r.getAs[Long]("exact_inter")}")
      assert(r.getAs[Long]("exact_union") >= r.getAs[Long]("exact_inter"))
    }
    // the sketch must actually see the fixture's real overlap signal
    assert(out.map(_.getAs[Long]("exact_inter")).max > 0L)
  }

  test("raw estimate tracks exact distinct on the fixture") {
    val docs = graft.Tables.load(spark, sf001, "documents")
    val out = PortableHll.profile(docs, col("text"), relErrBound = 0.15)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Boolean]("rel_err_ok"),
        s"estimate ${r.getAs[Double]("raw_est")} vs exact " +
          s"${r.getAs[Long]("exact_distinct")} for ${r.getAs[String]("source")}")
    }
  }
}
