package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.HashedScore
import graft.operators.TextOps

/** Model-based quality filtering — the fasttext-style linear scorer
  * every production curation pipeline runs between heuristic gates
  * (quality ratios, qt02) and expensive semantic passes: word bigrams
  * hash into [[HashedScoreImpl.D]] feature buckets, each bucket has a
  * weight, a document's score is the mean bigram weight, and `keep`
  * thresholds it. Weights are md5-derived — the externally-trained
  * mode (the [[graft.operators.similarity.PortableIvf]] argument):
  * swap in learned weights and nothing else changes.
  * (No reference analog; part of the added LLM-pipeline surface.)
  *
  * Scale shape: map-only. The whole scorer is ONE native codegen'd
  * expression per row ([[HashedScore]] — a tight md5 loop inside
  * whole-stage codegen, no UDF, no explode, no shuffle) plus builtin
  * arithmetic; 100 TB costs exactly one corpus read, fused with any
  * other per-row text signal. The integer weight sum is exact and
  * order-independent, so scores are bit-identical under any
  * partitioning — and in DuckDB, which re-derives every hash/weight:
  * fully value-oracled.
  */
object QualityClassifier {

  /** (doc_id, n_grams, score, keep): score = raw / (1000 · n_grams)
    * ∈ [-1, 1] (0 when the doc has no bigram), keep = score >= tau.
    * The reported score is floor-scaled to 6 places
    * ([[graft.operators.PortableRound]]) — round() diverged across
    * engines on the exact tie 1011/16000 at sf0.1 (qp05, doc 1248). */
  def score(df: DataFrame, text: Column, id: Column, tau: Double): DataFrame = {
    val toks = TextOps.tokens(text)
    val n = greatest(size(toks) - 1, lit(0)).cast("bigint")
    val raw = HashedScore(TextOps.normalized(text))
    df.select(
        id.as("doc_id"),
        n.as("n_grams"),
        when(n === 0, lit(0.0))
          .otherwise(raw.cast("double") / (lit(1000.0) * n))
          .as("__s"))
      .select(
        col("doc_id"),
        col("n_grams"),
        graft.operators.PortableRound.floorTo(col("__s"), 6).as("score"),
        (col("__s") >= tau).as("keep"))
  }

  /** The kept rows, original schema preserved. */
  def filterKept(df: DataFrame, text: Column, id: Column, idName: String,
      tau: Double): DataFrame =
    df.join(
      score(df, text, id, tau).filter(col("keep"))
        .select(col("doc_id").as(idName)),
      Seq(idName), "left_semi")

  private val normSql = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  private def md5_60(s: String): String =
    s"CAST(('0x' || substring(md5($s), 1, 15)) AS BIGINT)"

  /** qt26: DuckDB re-derives bucket, weight and exact integer sum. */
  def oracleSql(tau: Double): String = {
    val bucket = md5_60("g") + s" % ${graft.functions.HashedScoreImpl.D}"
    val weight = md5_60(s"'qw_' || CAST($bucket AS VARCHAR)") + " % 2001 - 1000"
    s"""WITH t AS (
       |  SELECT doc_id, string_split($normSql, ' ') AS ts FROM documents),
       |g AS (
       |  SELECT doc_id,
       |         CAST(len(ts) - 1 AS BIGINT) AS n_grams,
       |         list_sum(list_transform(
       |           list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1]),
       |           g -> $weight)) AS raw
       |  FROM t)
       |SELECT doc_id, n_grams,
       |       ${graft.operators.PortableRound.floorToSql(
         "CASE WHEN n_grams = 0 THEN 0.0 ELSE CAST(raw AS DOUBLE) / (1000.0 * n_grams) END", 6)}
       |         AS score,
       |       (CASE WHEN n_grams = 0 THEN 0.0
       |             ELSE CAST(raw AS DOUBLE) / (1000.0 * n_grams) END) >= $tau
       |         AS keep
       |FROM g""".stripMargin
  }
}
