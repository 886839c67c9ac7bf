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
      Some(CorpusPipeline.subwordOracleSql()))
  )
}
