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
      Some(CorpusPipeline.spanOracleSql()))
  )
}
