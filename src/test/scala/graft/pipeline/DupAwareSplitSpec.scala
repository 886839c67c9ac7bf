package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.dedup.{ConnectedComponents, PortableMinHash}
import graft.operators.text.CorpusOps

/** qp09's leakage invariant: a duplicate-aware split may never put two
  * docs of one near-dup component into different splits — that is the
  * entire point of hashing the component instead of the doc id. */
class DupAwareSplitSpec extends SparkSpec {

  private lazy val labeled = {
    val docs = Tables.load(spark, sf0001, "documents")
    val edges = PortableMinHash.pairs(docs, col("text"), col("doc_id"), 0.3)
    ConnectedComponents.components(edges, "doc_a", "doc_b", docs, "doc_id")(spark)
      .withColumn("split", CorpusOps.splitAssign(col("component")))
      .cache()
  }

  test("no component straddles two splits") {
    val straddlers = labeled.groupBy("component")
      .agg(countDistinct("split").as("n_splits"))
      .filter(col("n_splits") > 1)
    assert(straddlers.count() === 0)
  }

  test("multi-doc components exist, so the invariant is non-vacuous") {
    val multi = labeled.groupBy("component").count().filter(col("count") > 1)
    assert(multi.count() > 0, "fixture has no near-dup clusters at 0.3 — test proves nothing")
  }

  test("all three splits are populated and cover every doc") {
    val total = Tables.load(spark, sf0001, "documents").count()
    val bySplit = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet === Set("train", "validation", "test"))
    assert(bySplit.values.sum === total)
    // hash split is ~80/10/10 in expectation; just pin the ordering
    assert(bySplit("train") > bySplit("validation"))
    assert(bySplit("train") > bySplit("test"))
  }
}
