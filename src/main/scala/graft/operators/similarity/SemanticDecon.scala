package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space benchmark decontamination — the semantic complement
  * of [[graft.operators.text.Decontaminate]] (which matches exact
  * token 8-grams): a corpus item is contaminated when its embedding's
  * max cosine against ANY benchmark item reaches `tau`, catching
  * paraphrased or lightly-edited eval leakage that exact n-grams miss.
  * The reference has no analog (byte-for-byte row copies,
  * `cmd/root.go:423-424`); this is the LLM-corpus surface on the same
  * engine.
  *
  * Scale shape, mirroring Decontaminate's: the benchmark side is SMALL
  * BY DEFINITION (an eval set — thousands to ~10⁵ vectors), so it
  * broadcasts and the corpus NEVER shuffles its vectors: the
  * broadcast-nested-loop expansion is pipelined into a partial max
  * aggregation per corpus id, so one row per corpus item crosses the
  * only exchange. Per-row cost is |bench| fused-codegen cosines —
  * the exact price of an exact answer; cut it with
  * [[SemanticDedup]]-style cell restriction when the benchmark
  * outgrows broadcast.
  *
  * Portable: [[VectorOps.cosine]] is a bit-identical sequential
  * double fold on both engines, and max over a fixed candidate set is
  * order-independent, so the whole profile value-oracles (qs16).
  */
object SemanticDecon {

  /** Per-corpus-item contamination profile:
    * (id, max_cos rounded to 4, contaminated) — `contaminated` tests
    * the UNROUNDED max against `tau` (the qd13 convention). Rows with
    * a zero-norm corpus or benchmark vector score cosine 0 there, the
    * [[VectorOps.cosine]] convention on both engines. */
  def profile(
      corpus: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      bench: DataFrame,
      benchVec: Column,
      tau: Double): DataFrame =
    corpus.select(corpusId.as("id"), corpusVec.as("v"))
      .crossJoin(broadcast(bench.select(benchVec.as("bv"))))
      .groupBy("id")
      .agg(max(VectorOps.cosine(col("v"), col("bv"))).as("mc"))
      .select(
        col("id"),
        graft.operators.PortableRound.floorTo(col("mc"), 4).as("max_cos"),
        (col("mc") >= tau).as("contaminated"))

  /** The keep-side filter: corpus rows whose embedding stays below
    * `tau` against every benchmark item. */
  def clean(
      corpus: DataFrame,
      corpusVec: Column,
      idCol: String,
      bench: DataFrame,
      benchVec: Column,
      tau: Double): DataFrame = {
    val dirty = profile(corpus, corpusVec, col(idCol), bench, benchVec, tau)
      .filter(col("contaminated"))
      .select(col("id").as(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  private def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), " +
      s"i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String, dim: Int): String = {
    val d = s"sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE ${dotSql(a, b, dim)} / ($d) END"
  }

  /** DuckDB rendition over `embeddings` with label `benchLabel` as the
    * eval set: same cosine fold, same max, same rounding. */
  def oracleSql(benchLabel: Int, tau: Double, dim: Int = 64): String =
    s"""WITH b AS (SELECT embedding AS bv FROM embeddings
       |           WHERE label = $benchLabel),
       |c AS (SELECT vec_id, embedding AS v FROM embeddings
       |      WHERE label <> $benchLabel),
       |m AS (SELECT c.vec_id AS id, max(${cosineSql("c.v", "b.bv", dim)}) AS mc
       |      FROM c CROSS JOIN b GROUP BY c.vec_id)
       |SELECT id, (floor((mc) * 10000.0) / 10000.0) AS max_cos, mc >= $tau AS contaminated
       |FROM m""".stripMargin
}
