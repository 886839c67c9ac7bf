package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup.CanonicalSelect

class CanonicalSelectSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, 50L), (2L, 80L), (3L, 80L), // cluster A: 2 and 3 tie on quality
    (4L, 10L),                       // singleton
    (5L, 99L), (6L, 10L)             // cluster B
  ).toDF("doc_id", "n_chars")

  private val comp = Seq(
    (1L, 1L), (2L, 1L), (3L, 1L),
    (4L, 4L),
    (5L, 5L), (6L, 5L)).toDF("doc_id", "component")

  test("longest member wins; quality ties break to the lowest id") {
    val out = CanonicalSelect.label(docs, "doc_id", col("n_chars"), comp)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(2)).toSeq == Seq(2L, 2L, 2L, 4L, 5L, 5L))
    assert(out.map(_.getBoolean(3)).toSeq ==
      Seq(false, true, false, true, true, false))
  }

  test("select keeps exactly one doc per component with full schema") {
    val kept = CanonicalSelect.select(docs, "doc_id", col("n_chars"), comp)
    assert(kept.columns.toSeq == Seq("doc_id", "n_chars"))
    assert(kept.select("doc_id").as[Long].collect().sorted.toSeq ==
      Seq(2L, 4L, 5L))
  }
}
