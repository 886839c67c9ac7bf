package graft.queries

import graft.Tables
import graft.pipeline.CorpusPipeline

/** Composite end-to-end pipeline queries: several library operators
  * chained, verified against ONE DuckDB oracle built from the same
  * stage fragments. */
object PipelineQueries {

  val all: Seq[Q] = Seq(
    Q(
      "qp01_corpus_curation",
      (s, dir) => CorpusPipeline.curateStats(Tables.load(s, dir, "documents")),
      Some(CorpusPipeline.oracleSql())),
    Q(
      "qp02_span_curation",
      (s, dir) => CorpusPipeline.spanCurateStats(Tables.load(s, dir, "documents")),
      Some(CorpusPipeline.spanOracleSql())),
    Q(
      "qp03_subword_curation",
      // WordPiece segmentation -> [UNK]-share quality filter ->
      // temperature mix budgeted in subword pieces — round 7's
      // tokenizer and mixer chained under ONE composed value oracle
      (s, dir) => CorpusPipeline.subwordCurateStats(Tables.load(s, dir, "documents")),
      Some(CorpusPipeline.subwordOracleSql())),
    Q(
      "qp04_canonical_select",
      // near-dup clusters -> retention policy: portable-MinHash pairs
      // (qd10's mining) feed connected components (qd16's labels),
      // then the LONGEST member of each cluster survives (doc_id
      // tiebreak) — "which copy do we train on", the step after
      // clustering every whole-doc dedup pipeline needs
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val edges = graft.operators.dedup.PortableMinHash.pairs(
          docs, org.apache.spark.sql.functions.col("text"),
          org.apache.spark.sql.functions.col("doc_id"), 0.3)
        val comp = graft.operators.dedup.ConnectedComponents.components(
          edges, "doc_a", "doc_b", docs, "doc_id")(s)
        graft.operators.dedup.CanonicalSelect.label(
          docs.select("doc_id", "n_chars"), "doc_id",
          org.apache.spark.sql.functions.col("n_chars"), comp)
      },
      Some(graft.operators.dedup.PortableMinHash.oracleCanonicalSql(0.3)))
  )
}
