package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps
import graft.operators.dedup.PortableMinHash
import graft.operators.text.{CorpusOps, SpanDedup, TextAnalysis}

/** The end-to-end training-data curation pipeline, composed from the
  * library's own operators in the order a real corpus run uses them:
  *
  *   1. exact dedup   — keep the smallest doc_id per normalized text
  *   2. near-dup dedup — portable MinHash-LSH keep-first survivors
  *   3. quality filter — minimum token count
  *   4. split + stats  — deterministic hash split, per-split totals
  *
  * Scale shape is the sum of its parts (each stage documented at its
  * operator): one hash shuffle for stage 1, the LSH band-join pipeline
  * for stage 2, a pure filter for stage 3, one aggregation for stage 4
  * — nothing quadratic, nothing driver-side. Every stage is built from
  * engine-portable primitives, so the WHOLE composite carries a single
  * DuckDB value oracle ([[oracleSql]], query qp01) — the strongest
  * end-to-end correctness statement the library makes: four chained
  * operators, one bag-equal result across engines.
  */
object CorpusPipeline {

  /** Per-split (train/validation/test) doc and token counts of the
    * curated corpus. */
  def curateStats(
      docs: DataFrame,
      minTokens: Int = 20,
      simThreshold: Double = 0.3): DataFrame = {
    val survivors = curate(docs, minTokens, simThreshold)
    survivors
      .groupBy(CorpusOps.splitAssign(col("doc_id")).as("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .cast("bigint").as("total_tokens"))
  }

  /** The curated document set (all input columns preserved). */
  def curate(
      docs: DataFrame,
      minTokens: Int = 20,
      simThreshold: Double = 0.3): DataFrame = {
    // 1. exact dedup: min doc_id per normalized text (deterministic
    // canonical choice; one shuffle of (hash(nt), id))
    val keepExact = docs
      .groupBy(TextOps.normalized(col("text")).as("nt"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val d1 = docs.join(keepExact, Seq("doc_id"), "left_semi")
    // 2. near-dup dedup (keep-first over the portable pair graph)
    val d2 = PortableMinHash.dedupKeepFirst(d1, col("text"), "doc_id", simThreshold)
    // 3. quality gate
    d2.filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
  }

  /** The span-level curation variant (query qp02): drop documents
    * whose duplicated-span ratio exceeds `maxRatio` (boilerplate /
    * template copies the doc-level passes miss), then the token-count
    * quality gate, then per-source corpus stats. Two hash shuffles
    * (span table + final group-by) — nothing quadratic. */
  def spanCurateStats(
      docs: DataFrame,
      maxRatio: Double = 0.5,
      minTokens: Int = 20): DataFrame =
    SpanDedup.dropSpanHeavy(docs, col("text"), "doc_id", maxRatio)
      .filter(TextAnalysis.tokenCount(col("text")) >= minTokens)
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long"))
          .cast("bigint").as("total_tokens"))

  /** DuckDB rendition of [[spanCurateStats]] — the span-profile CTEs
    * spliced ahead of the filter + stats stages. */
  def spanOracleSql(maxRatio: Double = 0.5, minTokens: Int = 20): String = {
    val toks = "length(regexp_split_to_array(trim(text), '\\s+'))"
    s"""WITH ${SpanDedup.profileCtes("documents")},
       |heavy AS (SELECT id FROM span_prof WHERE dup_ratio > $maxRatio),
       |kept AS (
       |  SELECT * FROM documents
       |  WHERE doc_id NOT IN (SELECT id FROM heavy)
       |    AND $toks >= $minTokens)
       |SELECT source, count(*) AS n_docs,
       |       CAST(sum(CAST($toks AS BIGINT)) AS BIGINT) AS total_tokens
       |FROM kept GROUP BY source""".stripMargin
  }

  /** The curate-stage CTEs (exact dedup → near-dup keep-first → token
    * gate) rooted on `from`, ending in `d3` (the curated rows) — the
    * spliceable core of [[oracleSql]], reused by composed funnels
    * (qp08). */
  def curateCtes(
      from: String = "documents",
      minTokens: Int = 20,
      simThreshold: Double = 0.3): String = {
    val norm = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"
    val toks = "length(regexp_split_to_array(trim(text), '\\s+'))"
    // the minhash CTE chain re-rooted on the exact-dedup survivors d1
    val lsh = PortableMinHash.pipelineCtes("d1").replaceFirst("^WITH ", "")
    s"""keep1 AS (
       |  SELECT min(doc_id) AS doc_id
       |  FROM (SELECT doc_id, $norm AS nt0 FROM $from) z
       |  GROUP BY nt0),
       |d1 AS (SELECT d.* FROM $from d JOIN keep1 USING (doc_id)),
       |$lsh,
       |losers AS (SELECT DISTINCT doc_b FROM est WHERE est_jaccard >= $simThreshold),
       |d3 AS (
       |  SELECT * FROM d1
       |  WHERE doc_id NOT IN (SELECT doc_b FROM losers)
       |    AND $toks >= $minTokens)""".stripMargin
  }

  /** The DuckDB rendition of the whole pipeline — stage CTEs spliced
    * around the portable-minhash chain, same constants, same policies. */
  def oracleSql(minTokens: Int = 20, simThreshold: Double = 0.3): String = {
    val toks = "length(regexp_split_to_array(trim(text), '\\s+'))"
    s"""WITH ${curateCtes("documents", minTokens, simThreshold)}
       |SELECT CASE WHEN b < 80 THEN 'train'
       |            WHEN b < 90 THEN 'validation'
       |            ELSE 'test' END AS split,
       |       count(*) AS n_docs,
       |       CAST(sum(CAST($toks AS BIGINT)) AS BIGINT) AS total_tokens
       |FROM (SELECT *,
       |             CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
       |      FROM d3) x
       |GROUP BY 1""".stripMargin
  }

  /** Subword-denominated curation (qp03): the round's tokenizer and
    * mixer chained under one oracle —
    *
    *   1. WordPiece-segment every document (the REAL token counter)
    *   2. quality filter — [UNK] share <= maxUnkRatio (tokenizer
    *      coverage as the quality signal)
    *   3. temperature mix (α = 0.5) BUDGETED IN SUBWORD PIECES, via
    *      the injected token counter
    *   4. per-source doc and piece totals
    *
    * Every stage is engine-portable (greedy longest-match, exactly
    * rounded sqrt thresholds, md5 hash sampling), so the composite
    * carries a single DuckDB value oracle like qp01/qp02. */
  def subwordCurateStats(
      docs: DataFrame,
      maxUnkRatio: Double = 0.3,
      budgetPieces: Long = 2000L): DataFrame = {
    val withP = docs
      .withColumn("__p",
        graft.functions.WordPiece.tokens(TextOps.normalized(col("text"))))
      .withColumn("__np", size(col("__p")).cast("long"))
      .withColumn("__nu",
        size(filter(col("__p"), x => x === "[UNK]")).cast("long"))
    val good = withP.filter(
      col("__np") > 0 &&
        col("__nu").cast("double") / col("__np").cast("double") <= lit(maxUnkRatio))
    val kept = CorpusOps.temperatureMix(
      good, col("text"), col("doc_id"), col("source"),
      budgetPieces, alpha = 0.5, tokenCount = Some(col("__np")))
    kept.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(col("__np")).cast("bigint").as("kept_pieces"))
  }

  /** DuckDB rendition of [[subwordCurateStats]]: the WordPiece
    * recursive CTEs feed per-doc piece stats, the [UNK]-share filter,
    * and the qt22 threshold chain over the SURVIVORS' piece masses. */
  def subwordOracleSql(maxUnkRatio: Double = 0.3, budgetPieces: Long = 2000L): String =
    s"""WITH RECURSIVE ${graft.functions.WordPiece.oracleCtes()},
       |docstats AS (
       |  SELECT doc_id,
       |         CAST(COALESCE(sum(npieces), 0) AS BIGINT) AS np,
       |         CAST(COALESCE(sum(nunk), 0) AS BIGINT) AS nu
       |  FROM wp GROUP BY doc_id),
       |good AS (
       |  SELECT d.doc_id, d.source, s.np
       |  FROM documents d JOIN docstats s USING (doc_id)
       |  WHERE s.np > 0 AND CAST(s.nu AS DOUBLE) / CAST(s.np AS DOUBLE) <= $maxUnkRatio),
       |agg AS (SELECT source, sum(np) AS actual FROM good GROUP BY source),
       |pw AS (SELECT source, actual, sqrt(CAST(actual AS DOUBLE)) AS p FROM agg),
       |tot AS (SELECT list_reduce(list(p ORDER BY source), (a, b) -> a + b) AS tp FROM pw),
       |thr AS (SELECT source,
       |         CAST(floor(LEAST(1.0, ($budgetPieces.0 * (p / tp)) / CAST(actual AS DOUBLE))
       |                    * 1099511627776.0) AS BIGINT) AS t
       |        FROM pw, tot)
       |SELECT g.source AS source, count(*) AS n_docs,
       |       CAST(sum(np) AS BIGINT) AS kept_pieces
       |FROM good g JOIN thr ON g.source = thr.source
       |WHERE CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 10)) AS BIGINT) < thr.t
       |GROUP BY g.source""".stripMargin
}
