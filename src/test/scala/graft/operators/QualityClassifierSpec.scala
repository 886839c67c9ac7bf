package graft.operators

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.HashedScoreImpl
import graft.operators.text.QualityClassifier

class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  // independent re-derivation of the kernel's md5-60
  private def md5_60(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    java.lang.Long.parseLong(
      d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  private def expectedRaw(text: String): Long = {
    val ts = text.toLowerCase.trim.replaceAll("\\s+", " ").split(" ", -1)
    ts.sliding(2).filter(_.length == 2)
      .map { case Array(a, b) =>
        val bucket = md5_60(a + " " + b) % HashedScoreImpl.D
        md5_60("qw_" + bucket) % 2001 - 1000
      }
      .sum
  }

  private val docs = Seq(
    (1L, "The quick brown fox jumps over the lazy dog"),
    (2L, "single"),
    (3L, ""),
    (4L, "  Mixed   WHITESPACE  and Case ")
  ).toDF("doc_id", "text")

  test("scores match an independent driver-side re-derivation") {
    val out = QualityClassifier
      .score(docs, col("text"), col("doc_id"), tau = 0.0)
      .orderBy("doc_id").collect()
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "single", "", "mixed whitespace and case")
    out.zip(texts).foreach { case (row, t) =>
      val n = if (t.isEmpty) 0L else t.split(" ", -1).length - 1L
      assert(row.getLong(1) == n, s"n_grams for '$t'")
      val exp =
        if (n == 0) 0.0
        else math.floor(expectedRaw(t).toDouble / (1000.0 * n) * 1e6) / 1e6
      assert(row.getDouble(2) == exp, s"score for '$t'")
    }
  }

  test("keep thresholds on score; no-bigram docs score 0 and pass tau=0") {
    val out = QualityClassifier
      .score(docs, col("text"), col("doc_id"), tau = 0.0)
      .orderBy("doc_id").collect()
    out.foreach(r => assert(r.getBoolean(3) == (r.getDouble(2) >= 0.0)))
    assert(out(1).getDouble(2) == 0.0 && out(1).getBoolean(3))
    assert(out(2).getDouble(2) == 0.0 && out(2).getBoolean(3))
  }

  test("filterKept keeps original schema and exactly the passing docs") {
    val tau = 0.1
    val scored = QualityClassifier
      .score(docs, col("text"), col("doc_id"), tau).collect()
    val expectIds = scored.filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    val kept = QualityClassifier
      .filterKept(docs, col("text"), col("doc_id"), "doc_id", tau)
    assert(kept.columns.toSeq == Seq("doc_id", "text"))
    assert(kept.select("doc_id").as[Long].collect().toSet == expectIds)
  }

  test("the scorer stays inside whole-stage codegen (no UDF, no shuffle)") {
    // a range-backed source (the local Seq fixture constant-folds to a
    // LocalTableScan, which has no codegen span to inspect)
    val wide = spark.range(64).select(
      col("id").as("doc_id"),
      concat_ws(" ", lit("alpha"), col("id").cast("string"), lit("omega"))
        .as("text"))
    val plan = QualityClassifier
      .score(wide, col("text"), col("doc_id"), 0.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    // "*(1)" marks the whole-stage-codegen stage in the plan string
    assert(plan.contains("*(1) Project"))
  }
}
