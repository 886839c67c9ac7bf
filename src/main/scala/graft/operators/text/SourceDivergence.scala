package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{PortableRound, TextOps}

/** Pairwise source-distribution divergence: each source reduces to a
  * B-bucket multinomial over hashed unigram features (the DSIR model
  * shape), and every source PAIR gets its Jensen-Shannon divergence
  *
  *   JS(p,q) = ½·KL(p‖m) + ½·KL(q‖m),   m = (p+q)/2
  *
  * — the symmetric, bounded (≤ ln 2) measure of how DIFFERENTLY two
  * sources write, where qd27/qd28 measure how much they literally
  * SHARE. Low JS pairs are near-duplicate sources (merge or
  * deduplicate harder); high JS pairs are the diversity a mixture
  * design wants balanced. Used with qp14's budgets this is the
  * "which sources are actually distinct" input to mixture weighting.
  *
  * Scale shape: bucket counting is one map-side-combined aggregation
  * over exploded features; everything after runs on (sources × B) and
  * (source-pairs × B) tables whose size is set by the SOURCE COUNT
  * and B, not the corpus — at any corpus size the pair stage is a
  * self-join of an S·B-row table.
  *
  * Portability: per-bucket JS terms floor-scale to integer NANO-nats
  * and sum as BIGINTs (order-free); the documented bias is < B·1e-9
  * nats, far below any decision threshold. Value-oracled.
  */
object SourceDivergence {

  /** The pair matrix in EXACT integer nano-nats — the shared core of
    * [[jsMatrix]] (6-dp projection) and [[diversityBudgets]] (integer
    * arithmetic; no floored-double round trip whose cast semantics
    * could diverge across engines). */
  private def nanoMatrix(
      df: DataFrame,
      text: Column,
      source: Column,
      buckets: Int = 512,
      smoothing: Long = 1L): DataFrame = {
    require(buckets >= 2, s"bad buckets $buckets")
    val ss = df.sparkSession
    import ss.implicits._
    val feats = graft.operators.Parallelism.ensureMin(df)
      .select(source.as("src"), explode(TextOps.tokens(text)).as("term"))
      .where(col("term") =!= "")
      .select(col("src"),
        (conv(substring(md5(col("term")), 1, 8), 16, 10).cast("long")
          % buckets).as("b"))
    val cnt = feats.groupBy("src", "b").agg(count(lit(1)).as("n"))
    val tot = cnt.groupBy("src").agg(sum("n").as("t"))
    // dense (src, b) with Laplace smoothing — probabilities as exact
    // IEEE divisions of BIGINTs
    val dims = ss.range(buckets).select(col("id").as("b"))
    val dense = tot.crossJoin(dims)
      .join(cnt, Seq("src", "b"), "left")
      .select(col("src"), col("b"),
        ((coalesce(col("n"), lit(0L)) + lit(smoothing)).cast("double") /
          (col("t") + lit(smoothing * buckets)).cast("double")).as("p"))
    val a = dense.select(col("src").as("src_a"), col("b"),
      col("p").as("pa"))
    val bb = dense.select(col("src").as("src_b"), col("b"),
      col("p").as("pb"))
    val terms = a.join(bb, Seq("b")).where(col("src_a") < col("src_b"))
      .select(col("src_a"), col("src_b"),
        // ½·pa·ln(2pa/(pa+pb)) + ½·pb·ln(2pb/(pa+pb)), nano-floored
        (floor(col("pa") * lit(0.5) *
          log(lit(2.0) * col("pa") / (col("pa") + col("pb"))) * lit(1e9))
          .cast("long") +
          floor(col("pb") * lit(0.5) *
            log(lit(2.0) * col("pb") / (col("pa") + col("pb"))) * lit(1e9))
            .cast("long")).as("t_nano"))
    terms.groupBy("src_a", "src_b")
      .agg(sum("t_nano").as("js_nano"))
  }

  def jsMatrix(
      df: DataFrame,
      text: Column,
      source: Column,
      buckets: Int = 512,
      smoothing: Long = 1L): DataFrame =
    nanoMatrix(df, text, source, buckets, smoothing)
      .select(col("src_a"), col("src_b"),
        PortableRound.floorTo(
          col("js_nano").cast("double") / lit(1e9), 6).as("js"))

  /** Diversity-weighted mixture budgets: each source's token budget
    * is proportional to its MEAN JS divergence from every other
    * source (+1 nano-nat uniform prior so an all-identical corpus
    * degrades to an equal split instead of 0/0) — "spend the budget
    * on what's actually distinct", the mixture-design use qd29's
    * matrix exists for. The allocation is the largest-remainder
    * method over exact integers, so budgets SUM TO THE TOTAL exactly
    * and every step is engine-portable. Output: (source, n_pairs,
    * mean_js, budget_tokens). */
  def diversityBudgets(
      df: DataFrame,
      text: Column,
      source: Column,
      totalTokens: Long,
      buckets: Int = 512,
      smoothing: Long = 1L): DataFrame = {
    // weights are MICRO-nats (<= ~6.94e5) so totalTokens * w stays
    // far inside Long for any realistic budget; the bound keeps the
    // worst case exact (1e12 * 7e5 ~ 7e17 < 2^63)
    require(totalTokens >= 1 && totalTokens <= 1000000000000L,
      s"bad totalTokens $totalTokens (1 .. 1e12)")
    val m = nanoMatrix(df, text, source, buckets, smoothing)
    val pairAgg = m.select(col("src_a").as("src"), col("js_nano"))
      .unionByName(m.select(col("src_b").as("src"), col("js_nano")))
      .groupBy("src")
      .agg(count(lit(1)).as("n_pairs"), sum("js_nano").as("s_nano"))
    // EVERY source gets a row — a single-source corpus has no pairs
    // yet must still receive the whole budget (the prior's job)
    val srcs = df.select(source.as("src")).distinct()
    val perSrc = graft.operators.Barrier(
      srcs.join(pairAgg, Seq("src"), "left")
        .na.fill(0L, Seq("n_pairs", "s_nano"))
        // per-bucket floors can push a ~0 pair's integer sum a hair
        // NEGATIVE; clamp before weighting so a near-identical source
        // gets the uniform prior, never a negative share. n_pairs = 0
        // (single source) falls to the prior too.
        .withColumn("w",
          when(col("n_pairs") > 0,
            greatest(expr("(s_nano div n_pairs) div 1000"), lit(0L)))
            .otherwise(lit(0L)) + lit(1L)))
    val tot = perSrc.agg(sum("w").as("tw"))
    val base = perSrc.crossJoin(broadcast(tot))
      .withColumn("b", expr(s"($totalTokens * w) div tw"))
      .withColumn("rem", expr(s"($totalTokens * w) % tw"))
    val leftover = base.agg((lit(totalTokens) - sum("b")).as("r"))
    val byRem = org.apache.spark.sql.expressions.Window
      .orderBy(col("rem").desc, col("src"))
    base.crossJoin(broadcast(leftover))
      .withColumn("rk", row_number().over(byRem))
      .select(
        col("src").as("source"),
        col("n_pairs").cast("bigint").as("n_pairs"),
        when(col("n_pairs") > 0,
          PortableRound.floorTo(
            expr("s_nano div n_pairs").cast("double") / lit(1e9), 6))
          .otherwise(lit(0.0)).as("mean_js"),
        (col("b") + when(col("rk") <= col("r"), 1L).otherwise(0L))
          .cast("bigint").as("budget_tokens"))
  }

  /** qp27 oracle — literal SQL twin of [[diversityBudgets]]. */
  def oracleBudgetsSql(
      totalTokens: Long,
      buckets: Int = 512,
      smoothing: Long = 1L): String =
    s"""WITH ${jsCtes(buckets, smoothing)},
       |pair_agg AS (
       |  SELECT src, count(*)::BIGINT AS n_pairs,
       |         CAST(sum(js_nano) AS BIGINT) AS s_nano
       |  FROM (SELECT src_a AS src, js_nano FROM jsm
       |        UNION ALL SELECT src_b AS src, js_nano FROM jsm) u
       |  GROUP BY src),
       |per_src AS (
       |  SELECT s.src,
       |         coalesce(pair_agg.n_pairs, 0) AS n_pairs,
       |         coalesce(pair_agg.s_nano, 0) AS s_nano,
       |         CASE WHEN coalesce(pair_agg.n_pairs, 0) > 0
       |              THEN greatest((pair_agg.s_nano // pair_agg.n_pairs) // 1000, 0)
       |              ELSE 0 END + 1 AS w
       |  FROM (SELECT DISTINCT source AS src FROM documents) s
       |  LEFT JOIN pair_agg ON pair_agg.src = s.src),
       |tw AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM per_src),
       |base AS (
       |  SELECT src, n_pairs, s_nano,
       |         ($totalTokens * w) // tw.tw AS b,
       |         ($totalTokens * w) % tw.tw AS rem
       |  FROM per_src, tw),
       |lo AS (SELECT $totalTokens - CAST(sum(b) AS BIGINT) AS r FROM base),
       |ranked AS (
       |  SELECT base.*, lo.r,
       |         row_number() OVER (ORDER BY rem DESC, src) AS rk
       |  FROM base, lo)
       |SELECT src AS source, n_pairs,
       |       CASE WHEN n_pairs > 0
       |            THEN ${PortableRound.floorToSql(
          "CAST(s_nano // n_pairs AS DOUBLE) / 1000000000.0", 6)}
       |            ELSE 0.0 END AS mean_js,
       |       CAST(b + CASE WHEN rk <= r THEN 1 ELSE 0 END AS BIGINT) AS budget_tokens
       |FROM ranked""".stripMargin

  /** Composable CTE chain ending in `jsm(src_a, src_b, js_nano)` —
    * the pair matrix in exact integer nano-nats, for oracles that
    * build on the divergences (qp27 derives mixture budgets). */
  def jsCtes(buckets: Int = 512, smoothing: Long = 1L): String =
    s"""jsd_feats AS (
       |  SELECT source AS src,
       |         CAST(('0x' || substring(md5(term), 1, 8)) AS BIGINT) % $buckets AS b
       |  FROM (SELECT source, unnest(string_split(
       |          regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS term
       |        FROM documents) z
       |  WHERE term <> ''),
       |jsd_cnt AS (SELECT src, b, count(*)::BIGINT AS n FROM jsd_feats GROUP BY src, b),
       |jsd_tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS t FROM jsd_cnt GROUP BY src),
       |jsd_dims AS (SELECT unnest(range(0, $buckets)) AS b),
       |jsd_dense AS (
       |  SELECT jsd_tot.src, jsd_dims.b,
       |         (CAST(coalesce(jsd_cnt.n, 0) + $smoothing AS DOUBLE) /
       |          CAST(jsd_tot.t + ${smoothing} * $buckets AS DOUBLE)) AS p
       |  FROM jsd_tot CROSS JOIN jsd_dims
       |  LEFT JOIN jsd_cnt ON jsd_cnt.src = jsd_tot.src AND jsd_cnt.b = jsd_dims.b),
       |jsd_terms AS (
       |  SELECT a.src AS src_a, q.src AS src_b,
       |         CAST(floor(a.p * 0.5 * ln(2.0 * a.p / (a.p + q.p)) * 1000000000.0) AS BIGINT) +
       |         CAST(floor(q.p * 0.5 * ln(2.0 * q.p / (a.p + q.p)) * 1000000000.0) AS BIGINT) AS t_nano
       |  FROM jsd_dense a JOIN jsd_dense q ON a.b = q.b AND a.src < q.src),
       |jsm AS (SELECT src_a, src_b, CAST(sum(t_nano) AS BIGINT) AS js_nano
       |        FROM jsd_terms GROUP BY src_a, src_b)""".stripMargin

  /** qd29 oracle — literal SQL twin of [[jsMatrix]], delegating to
    * the shared [[jsCtes]] chain. */
  def oracleSql(buckets: Int = 512, smoothing: Long = 1L): String =
    s"""WITH ${jsCtes(buckets, smoothing)}
       |SELECT src_a, src_b,
       |       ${PortableRound.floorToSql(
          "CAST(js_nano AS DOUBLE) / 1000000000.0", 6)} AS js
       |FROM jsm""".stripMargin
}
