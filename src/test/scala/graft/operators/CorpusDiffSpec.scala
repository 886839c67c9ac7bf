package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup.CorpusDiff

class CorpusDiffSpec extends SparkSpec {
  import spark.implicits._

  private val v1 = Seq(
    (1L, "alpha"), (2L, "bravo"), (3L, "charlie"), (4L, "delta"))
  private val v2 = Seq(
    (1L, "alpha"),          // unchanged
    (2L, "bravo EDITED"),   // changed
    (4L, "delta"),          // unchanged
    (9L, "echo"))           // added; 3 removed

  test("every id lands in exactly one status") {
    val ids = CorpusDiff.diffIds(
        v1.toDF("doc_id", "text"), v2.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(Long, String, Long)].collect()
    val byId = ids.map(r => r._1 -> r._2).toMap
    assert(ids.length == 5 && byId.size == 5)
    assert(byId(1L) == "unchanged" && byId(4L) == "unchanged")
    assert(byId(2L) == "changed")
    assert(byId(3L) == "removed")
    assert(byId(9L) == "added")
  }

  test("summary counts docs and chars per status, new side forward") {
    val got = CorpusDiff.diff(
        v1.toDF("doc_id", "text"), v2.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("unchanged") == ((2L, 10L)))     // alpha + delta
    assert(got("changed") == ((1L, 12L)))       // "bravo EDITED"
    assert(got("removed") == ((1L, 7L)))        // charlie (v1 bytes)
    assert(got("added") == ((1L, 4L)))          // echo
  }

  test("identical corpora diff to a single all-unchanged row") {
    val df = v1.toDF("doc_id", "text")
    val got = CorpusDiff.diff(df, df, col("doc_id"), col("text"))
      .as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("unchanged", 4L, 22L)))
  }

  test("the synthetic v2 derivation produces all four statuses") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val got = CorpusDiff.diff(
        docs, CorpusDiff.syntheticV2(docs), col("doc_id"), col("text"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got.keySet == Set("added", "removed", "changed", "unchanged"))
    // drops are doc_id % 7 == 0; edits doc_id % 11 == 0 minus the
    // dropped overlap; adds doc_id % 13 == 0
    val n = docs.count()
    assert(got("removed") == docs.where(col("doc_id") % 7 === 0).count())
    assert(got("added") == docs.where(col("doc_id") % 13 === 0).count())
    assert(got("changed") ==
      docs.where(col("doc_id") % 11 === 0 && col("doc_id") % 7 =!= 0).count())
    assert(got.values.sum == n + got("added"))
  }
}
