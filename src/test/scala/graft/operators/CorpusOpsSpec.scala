package graft.operators

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.text.CorpusOps

class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  test("hash split is deterministic, total, and roughly proportional") {
    val docs = Tables.load(spark, sf001, "documents")
    val counts = docs
      .groupBy(CorpusOps.splitAssign(col("doc_id")).as("split"))
      .count()
      .as[(String, Long)].collect().toMap
    assert(counts.keySet.subsetOf(Set("train", "validation", "test")))
    assert(counts.values.sum == docs.count())
    // 80/10/10 within generous tolerance at n=500
    assert(counts("train") > 350 && counts("train") < 450, counts.toString)
    // determinism: recompute equals itself
    val again = docs
      .groupBy(CorpusOps.splitAssign(col("doc_id")).as("split"))
      .count().as[(String, Long)].collect().toMap
    assert(again == counts)
  }

  test("packBins fills sequentially and only overfills at bin boundaries") {
    val df = Seq(
      ("a", 1L, 1000L), ("a", 2L, 1000L), ("a", 3L, 500L),
      ("a", 4L, 700L), ("b", 1L, 2500L), ("b", 2L, 100L)
    ).toDF("src", "id", "toks")
    val got = df
      .withColumn("bin", CorpusOps.packBins(col("toks"), col("src"), col("id"), 2048L))
      .select("src", "id", "bin")
      .as[(String, Long, Long)].collect().toSet
    // a: cums 1000,2000,2500,3200 -> starts 0,1000,2000,2500 -> bins 0,0,0,1
    // b: cums 2500,2600 -> starts 0,2500 -> bins 0,1
    assert(got == Set(
      ("a", 1L, 0L), ("a", 2L, 0L), ("a", 3L, 0L), ("a", 4L, 1L),
      ("b", 1L, 0L), ("b", 2L, 1L)))
  }

  test("split percentages validate") {
    intercept[IllegalArgumentException] {
      CorpusOps.splitAssign(col("x"), trainPct = 90, validPct = 20)
    }
  }
}
