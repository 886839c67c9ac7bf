package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus comparison / domain-drift detection: which terms are most
  * over-represented in slice A of a corpus relative to slice B? The
  * question a pipeline asks when a new crawl snapshot, a new source,
  * or a filtered subset needs characterizing against the rest —
  * "what changed" rendered as the top discriminative vocabulary.
  *
  * Score: add-one-smoothed rate ratio
  * `((cA+1)/(nA+2)) / ((cB+1)/(nB+2))` — the odds a term shows up in
  * A vs B with Laplace smoothing so B-absent terms rank finite. The
  * arithmetic is deliberately log-free and sum-free: counts are exact
  * BIGINTs, each rate is ONE integer→double division (IEEE-exact and
  * engine-identical), and the ratio is one more division — so every
  * score is bit-identical across Spark and the SQL oracle, unlike a
  * log-likelihood-ratio formulation whose `ln` differs by ULPs
  * between libms. Ranking by ratio then term is a total order.
  *
  * Scale shape: one explode feeding ONE term-keyed shuffle with
  * map-side partial aggregation (conditional sums, not two passes);
  * the per-term counts materialize once (Barrier) and the corpus
  * totals fold over THEM (n_a = Σ c_a exactly) as a 1-row aggregate
  * broadcast into the score projection; top-k is TakeOrdered, never a
  * full sort. Nothing here is quadratic and the only wide exchange is
  * the term groupBy any word-count already pays.
  *
  * Reference scope: no analog (the reference pushes SQL strings to
  * MySQL, mysqlDataSyncTool cmd/root.go:395-424); LLM-pipeline
  * north-star surface like qt11/qt14.
  */
object DiscriminativeTerms {

  /** Top-k terms over-represented in the `inA` slice. Output:
    * (term, c_a, c_b, rate_ratio), ranked rate_ratio DESC, term ASC.
    * Terms with fewer than `minCount` total occurrences are dropped —
    * single-occurrence junk otherwise dominates any ratio ranking. */
  def topTerms(
      docs: DataFrame,
      text: Column,
      inA: Column,
      k: Int,
      minCount: Long = 5L): DataFrame = {
    val toks = docs.select(
      explode(split(lower(trim(text)), "\\s+")).as("term"),
      inA.cast("boolean").as("in_a"))
    // n_a = Σ c_a exactly: fold the totals over the per-term counts so
    // the corpus is tokenized ONCE. The counts table is materialized
    // behind a Barrier (term-cardinality rows — the aggregate any
    // word count already produces) because AQE's exchange reuse is
    // context-dependent (a cached input splits the two consumers into
    // separate cache stages and re-runs the explode); the barrier
    // makes single-tokenization unconditional and plan-decidable
    // (DiscriminativeTermsSpec asserts NO Generate in the final plan).
    val counts = graft.operators.Barrier(
      toks.groupBy("term").agg(
        sum(when(col("in_a"), 1L).otherwise(0L)).as("c_a"),
        sum(when(col("in_a"), 0L).otherwise(1L)).as("c_b")))
    val totals = counts.agg(
      sum(col("c_a")).as("n_a"),
      sum(col("c_b")).as("n_b"))
    counts
      .crossJoin(broadcast(totals))
      .filter(col("c_a") + col("c_b") >= minCount)
      .withColumn(
        "rate_ratio",
        ((col("c_a") + 1).cast("double") / (col("n_a") + 2).cast("double")) /
          ((col("c_b") + 1).cast("double") / (col("n_b") + 2).cast("double")))
      .select("term", "c_a", "c_b", "rate_ratio")
      .orderBy(col("rate_ratio").desc, col("term").asc)
      .limit(k)
  }

  /** The DuckDB rendition: identical tokenization (qt11's split
    * contract), identical conditional-sum counts, identical division
    * order — every output double bit-identical. `slicePredicate` is a
    * SQL boolean over `documents` columns (e.g. "lang = 'en'"). */
  def oracleSql(slicePredicate: String, k: Int, minCount: Long = 5L): String =
    s"""WITH toks AS (
       |  SELECT unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS term,
       |         ($slicePredicate) AS in_a
       |  FROM documents),
       |counts AS (
       |  SELECT term,
       |         CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS c_a,
       |         CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS c_b
       |  FROM toks GROUP BY term),
       |totals AS (
       |  SELECT CAST(sum(CASE WHEN in_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |         CAST(sum(CASE WHEN in_a THEN 0 ELSE 1 END) AS BIGINT) AS n_b
       |  FROM toks)
       |SELECT term, c_a, c_b,
       |       (CAST(c_a + 1 AS DOUBLE) / CAST(n_a + 2 AS DOUBLE)) /
       |       (CAST(c_b + 1 AS DOUBLE) / CAST(n_b + 2 AS DOUBLE)) AS rate_ratio
       |FROM counts, totals
       |WHERE c_a + c_b >= $minCount
       |ORDER BY rate_ratio DESC, term ASC
       |LIMIT $k""".stripMargin
}
