package graft.pipeline

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.text.TextAnalysis

class CorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  test("curation only removes rows, keeps schema, and is deterministic") {
    val docs = Tables.load(spark, sf001, "documents")
    val curated = CorpusPipeline.curate(docs).cache()
    assert(curated.columns.toSeq == docs.columns.toSeq)
    assert(curated.count() <= docs.count())
    assert(curated.count() > 0)
    // survivors are a subset of the input
    assert(curated.exceptAll(docs).isEmpty)
    // every survivor clears the quality gate
    assert(curated
      .filter(TextAnalysis.tokenCount(col("text")) < 20).isEmpty)
    // deterministic end to end
    val again = CorpusPipeline.curate(docs)
    assert(curated.exceptAll(again).isEmpty && again.exceptAll(curated).isEmpty)
  }

  test("exact duplicates collapse to the smallest doc_id") {
    val docs = Tables.load(spark, sf001, "documents").limit(50)
      .select("doc_id", "text", "lang", "source", "n_chars")
    // plant an exact duplicate of the min doc with a larger id
    val minDoc = docs.orderBy("doc_id").limit(1)
    val dup = minDoc.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val curated = CorpusPipeline.curate(docs.unionByName(dup), minTokens = 0)
    assert(curated.filter(col("doc_id") >= 1000000L).isEmpty,
      "the planted duplicate (larger id) must lose to the original")
  }
}
