package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.Tables
import graft.operators.text.HybridRetrieval

class HybridRetrievalSpec extends SparkSpec {

  test("fused ranks carry exact RRF contributions and both lists fuse") {
    val docs = Tables.load(spark, sf001, "documents")
    val emb = Tables.load(spark, sf001, "embeddings")
    val out = HybridRetrieval.topK(
      docs, col("text"), col("doc_id"), emb,
      queryTerms = Seq("spark", "window", "vector"),
      probeId = 0L, kPerList = 50, kOut = 15).collect()
    assert(out.length == 15)
    out.foreach { r =>
      val lex = Option(r.getAs[java.lang.Long]("lex_rank")).map(_.toLong)
      val den = Option(r.getAs[java.lang.Long]("dense_rank")).map(_.toLong)
      assert(lex.nonEmpty || den.nonEmpty, "a fused row from neither list")
      val expect = lex.map(x => 1000000L / (HybridRetrieval.K + x)).getOrElse(0L) +
        den.map(x => 1000000L / (HybridRetrieval.K + x)).getOrElse(0L)
      assert(r.getAs[Long]("rrf_scaled") == expect,
        s"rrf mismatch for id ${r.getAs[Long]("id")}")
    }
    // descending, id tiebreak — the deterministic cut contract
    val scores = out.map(_.getAs[Long]("rrf_scaled")).toSeq
    assert(scores == scores.sorted.reverse)
    // a doc in BOTH lists at rank r outranks a doc only in one list
    // at the same rank (fusion actually fuses)
    val both = out.filter(r => r.get(1) != null && r.get(2) != null)
    assert(both.nonEmpty, "no document appeared in both lists — fusion untested")
  }

  test("batch hybrid equals the solo path query-for-query") {
    val docs = Tables.load(spark, sf0001, "documents")
    val queries = graft.queries.HybridBatchFixture.queries
    val batch = HybridRetrieval.textTopKBatch(
        docs, col("text"), col("doc_id"), queries,
        kPerList = 20, kOut = 10)
      .collect()
      .groupBy(_.getAs[Long]("query_id"))
    queries.foreach { case (qid, q) =>
      val solo = HybridRetrieval.textTopK(
          docs, col("text"), col("doc_id"), q, kPerList = 20, kOut = 10)
        .collect()
        .map(r => (r.get(0), r.get(1), r.get(2), r.get(3)))
        .toSeq
      val got = batch(qid).toSeq
        .sortBy(r => (-r.getAs[Long]("rrf_scaled"), r.getAs[Long]("id")))
        .map(r => (r.get(1), r.get(2), r.get(3), r.get(4)))
      assert(got == solo, s"query $qid: batch != solo\n$got\n$solo")
    }
  }

  test("single-list docs still surface when lists are disjoint") {
    val docs = Tables.load(spark, sf0001, "documents")
    val emb = Tables.load(spark, sf0001, "embeddings")
    // a query no document matches: lexical list is empty, the dense
    // list alone must fill the output
    val out = HybridRetrieval.topK(
      docs, col("text"), col("doc_id"), emb,
      queryTerms = Seq("zzzznotaterm"),
      probeId = 0L, kPerList = 20, kOut = 10).collect()
    assert(out.length == 10)
    assert(out.forall(_.get(1) == null), "lexical rank from an empty list")
    assert(out.forall(_.get(2) != null))
  }
}
