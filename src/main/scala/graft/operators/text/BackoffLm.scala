package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{PortableRound, TextOps}

/** Distributed stupid-backoff trigram language model — the classic
  * web-scale count-based LM (Brants et al. 2007, "Large Language
  * Models in Machine Translation"): train unigram/bigram/trigram count
  * tables over the corpus, then score every token by
  *
  *   S(w | p2 p1) = c3(p2 p1 w)/c2(p2 p1)        if c3 > 0
  *                = alpha   * S(w | p1)            otherwise
  *   S(w | p1)    = c2(p1 w)/c1(p1)               if c2 > 0
  *                = alpha   * S(w)                 otherwise
  *   S(w)         = c1(w)/N
  *
  * (no discounting, no normalization — the point of stupid backoff is
  * that scores need only RANK documents, so training is pure counting
  * and distributes perfectly). A document's score is the mean negative
  * log-score of its tokens, the same cross-entropy-style gate as
  * [[PerplexityFilter]] but context-aware: it penalizes improbable
  * SEQUENCES (shuffled words, boilerplate soup), not just rare words.
  * Sits above [[PerplexityFilter]] in the curation ladder.
  *
  * Scale shape (this is the historical MapReduce LM, re-expressed
  * declaratively): the only state is three count tables keyed by
  * n-grams — unigrams are vocabulary-sized, bigrams/trigrams are
  * bounded by `minCount` pruning (Brants et al. prune singletons at
  * web scale; the tables then broadcast or hash-join). The token
  * stream stays narrow — (doc, pos, term, p1, p2) — and every join is
  * an equi-join on n-gram keys that AQE plans as broadcast when a
  * pruned table is small and as a co-partitioned hash join otherwise.
  * No driver-side state at any size; counting has map-side partials.
  *
  * Portability (value-oracled in DuckDB): every score is a ratio of
  * two BIGINTs (exact IEEE division), `ln` of it floor-scales to
  * integer MICRO-NATS (`floor(ln(r)*1e6)` as BIGINT) so the per-doc
  * rollup is an order-free integer sum; the alpha penalty enters as a
  * precomputed integer constant (`floor(ln(alpha)*1e6)`, embedded
  * literally in both engines); the final cross-entropy floor-scales
  * to 4 dp ([[PortableRound]]).
  */
object BackoffLm {

  /** Integer micro-nats for the per-backoff-level alpha penalty —
    * computed once driver-side and embedded as a literal in BOTH
    * engines, so no cross-engine `ln` call is involved. */
  def alphaMicro(alpha: Double): Long =
    math.floor(math.log(alpha) * 1e6).toLong

  /** The scored token stream: one row per token with its backoff
    * level and integer micro-nat log-score. Columns:
    * (id, pos, term, lvl in {tri,bi,uni}, lp BIGINT micro-nats)
    * plus any `carry` columns (e.g. lang) propagated from the input.
    *
    * `minCount` prunes bigram/trigram COUNT TABLES (rows with
    * n < minCount back off), the standard way the model stays bounded
    * at corpus scale; 1 = exact. */
  def scoredTokens(
      df: DataFrame,
      text: Column,
      id: Column,
      alpha: Double = 0.4,
      minCount: Long = 1,
      carry: Seq[String] = Nil): DataFrame = {
    require(alpha > 0 && alpha < 1, s"bad alpha $alpha")
    require(minCount >= 1, s"bad minCount $minCount")
    val lnA = alphaMicro(alpha)
    val (stream, c1, c2, c3, n) = streamAndCounts(df, text, id, minCount, carry)

    // each count table joins the stream under its own key set; the
    // trigram CONTEXT count reuses c2 keyed (p2, p1), the bigram
    // context reuses c1 keyed (p1)
    val tri = c3.select(col("p2").as("t_p2"), col("p1").as("t_p1"),
      col("term").as("t_w"), col("n3"))
    val triCtx = c2.select(col("p1").as("x_p2"), col("term").as("x_p1"),
      col("n2").as("nc2"))
    val bi = c2.select(col("p1").as("b_p1"), col("term").as("b_w"), col("n2"))
    val biCtx = c1.select(col("term").as("y_p1"), col("n1").as("nc1"))
    val uni = c1.select(col("term").as("u_w"), col("n1"))

    val microLn = (num: Column, den: Column) =>
      floor(log(num.cast("double") / den) * lit(1e6)).cast("long")

    stream
      .join(tri, col("p2") === col("t_p2") && col("p1") === col("t_p1") &&
        col("term") === col("t_w"), "left")
      .join(triCtx, col("p2") === col("x_p2") && col("p1") === col("x_p1"), "left")
      .join(bi, col("p1") === col("b_p1") && col("term") === col("b_w"), "left")
      .join(biCtx, col("p1") === col("y_p1"), "left")
      .join(uni, col("term") === col("u_w"), "left")
      .crossJoin(broadcast(n))
      .select((col("id") +: carry.map(col)) ++ Seq(
        col("pos"), col("term"),
        when(col("n3").isNotNull, lit("tri"))
          .when(col("n2").isNotNull, lit("bi"))
          .otherwise(lit("uni")).as("lvl"),
        when(col("n3").isNotNull, microLn(col("n3"), col("nc2").cast("double")))
          .when(col("n2").isNotNull,
            microLn(col("n2"), col("nc1").cast("double")) +
              when(col("p2").isNotNull, lit(lnA)).otherwise(lit(0L)))
          .otherwise(
            microLn(col("n1"), col("total")) +
              when(col("p2").isNotNull, lit(2L * lnA))
                .when(col("p1").isNotNull, lit(lnA))
                .otherwise(lit(0L))).as("lp")): _*)
  }

  /** The lag-context token stream and the three (pruned) count
    * tables — shared by scoring and the tuning curve. */
  private def streamAndCounts(
      df: DataFrame,
      text: Column,
      id: Column,
      minCount: Long,
      carry: Seq[String] = Nil)
      : (DataFrame, DataFrame, DataFrame, DataFrame, DataFrame) = {
    // p1/p2 derive from the token ARRAY at explode time — pos is the
    // 0-based array index, so lag(term, k) over (id, pos) is exactly
    // toks[pos−k]. The lag() formulation paid a full window
    // exchange+sort of the exploded stream, and paid it once per
    // CONSUMER: this un-Barrier'd subtree is evaluated by c1, c2, c3
    // AND the scoring join (four plans), so the window was four
    // shuffles per scoring run. The array is carried through the
    // generate only within the stage (never shuffled) and read by
    // guarded element_at — row values are identical to the lag form.
    val stream = graft.operators.Parallelism.ensureMin(df)
      .select((id.as("id") +: carry.map(col)) :+
        TextOps.tokens(text).as("__t"): _*)
      .select((col("id") +: carry.map(col)) ++ Seq(
        col("__t"), posexplode(col("__t")).as(Seq("pos", "term"))): _*)
      .select((col("id") +: carry.map(col)) ++ Seq(
        col("pos"), col("term"),
        when(col("pos") >= 1, element_at(col("__t"), col("pos"))).as("p1"),
        when(col("pos") >= 2, element_at(col("__t"), col("pos") - 1)).as("p2")): _*)
    val c1 = stream.groupBy("term").agg(count(lit(1)).as("n1"))
    val n = c1.agg(sum("n1").cast("double").as("total"))
    val c2 = stream.where(col("p1").isNotNull)
      .groupBy("p1", "term").agg(count(lit(1)).as("n2"))
      .where(col("n2") >= minCount)
    val c3 = stream.where(col("p2").isNotNull)
      .groupBy("p2", "p1", "term").agg(count(lit(1)).as("n3"))
      .where(col("n3") >= minCount)
    (stream, c1, c2, c3, n)
  }

  /** Per-document scoring: (id, n_tokens, tri_hits, bi_hits, uni_hits,
    * ce, keep) — ce is the 4-dp mean negative log-score in nats; keep
    * gates ce <= tau. */
  def score(
      df: DataFrame,
      text: Column,
      id: Column,
      alpha: Double = 0.4,
      tau: Double = 8.0,
      minCount: Long = 1): DataFrame =
    scoredTokens(df, text, id, alpha, minCount)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_tokens"),
        sum(when(col("lvl") === "tri", 1L).otherwise(0L)).as("tri_hits"),
        sum(when(col("lvl") === "bi", 1L).otherwise(0L)).as("bi_hits"),
        sum(when(col("lvl") === "uni", 1L).otherwise(0L)).as("uni_hits"),
        sum("lp").as("sum_lp"))
      .select(
        col("id"), col("n_tokens"),
        col("tri_hits").cast("bigint").as("tri_hits"),
        col("bi_hits").cast("bigint").as("bi_hits"),
        col("uni_hits").cast("bigint").as("uni_hits"),
        PortableRound.floorTo(
          -col("sum_lp").cast("double") / lit(1e6) / col("n_tokens").cast("double"),
          4).as("ce"))
      .withColumn("keep", col("ce") <= tau)

  /** Per-language coverage rollup: how much of each language's token
    * stream the trained model scores at each backoff level, and the
    * language's corpus-level cross-entropy (integer micro-nat sums —
    * no float accumulation anywhere). */
  def coverage(
      df: DataFrame,
      text: Column,
      id: Column,
      lang: Column,
      alpha: Double = 0.4,
      minCount: Long = 1): DataFrame =
    scoredTokens(df.withColumn("_lang", lang), text, id, alpha, minCount,
      carry = Seq("_lang"))
      .groupBy(col("_lang").as("lang"))
      .agg(
        countDistinct("id").cast("bigint").as("n_docs"),
        count(lit(1)).as("n_tokens"),
        sum(when(col("lvl") === "tri", 1L).otherwise(0L)).as("tri_hits"),
        sum(when(col("lvl") === "bi", 1L).otherwise(0L)).as("bi_hits"),
        sum(when(col("lvl") === "uni", 1L).otherwise(0L)).as("uni_hits"),
        sum("lp").as("sum_lp"))
      .select(
        col("lang"), col("n_docs"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        PortableRound.floorTo(
          col("tri_hits").cast("double") / col("n_tokens").cast("double"),
          4).as("tri_rate"),
        PortableRound.floorTo(
          col("bi_hits").cast("double") / col("n_tokens").cast("double"),
          4).as("bi_rate"),
        PortableRound.floorTo(
          col("uni_hits").cast("double") / col("n_tokens").cast("double"),
          4).as("uni_rate"),
        PortableRound.floorTo(
          -col("sum_lp").cast("double") / lit(1e6) / col("n_tokens").cast("double"),
          4).as("ce"))

  /** The minCount TUNING CURVE (qt47/qt50/qp19's sibling for the LM):
    * one row per candidate prune threshold with the STATE-SIZE axis
    * (surviving bi/trigram table rows — what a 100 TB deployment pays
    * to store and join) against the QUALITY axis (backoff-level hit
    * rates and corpus cross-entropy). The operating point is read off
    * this table: raise minCount until the state fits, watch tri_rate
    * pay for it. */
  def minCountCurve(
      df: DataFrame,
      text: Column,
      id: Column,
      alpha: Double = 0.4,
      minCounts: Seq[Long] = Seq(1L, 2L, 4L, 8L)): DataFrame = {
    require(minCounts.nonEmpty, "no minCounts")
    minCounts.map { mc =>
      val (_, _, c2, c3, _) = streamAndCounts(df, text, id, mc)
      val sizes = c3.agg(count(lit(1)).as("tri_table_rows"))
        .crossJoin(c2.agg(count(lit(1)).as("bi_table_rows")))
      scoredTokens(df, text, id, alpha, mc)
        .agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("lvl") === "tri", 1L).otherwise(0L)).as("tri_hits"),
          sum(when(col("lvl") === "bi", 1L).otherwise(0L)).as("bi_hits"),
          sum("lp").as("sum_lp"))
        .crossJoin(sizes)
        .select(
          lit(mc).as("min_count"),
          col("tri_table_rows").cast("bigint").as("tri_table_rows"),
          col("bi_table_rows").cast("bigint").as("bi_table_rows"),
          col("n_tokens").cast("bigint").as("n_tokens"),
          PortableRound.floorTo(
            col("tri_hits").cast("double") / col("n_tokens").cast("double"),
            4).as("tri_rate"),
          PortableRound.floorTo(
            col("bi_hits").cast("double") / col("n_tokens").cast("double"),
            4).as("bi_rate"),
          PortableRound.floorTo(
            -col("sum_lp").cast("double") / lit(1e6) /
              col("n_tokens").cast("double"), 4).as("ce"))
    }.reduce(_.unionByName(_))
  }

  /** qt56 oracle — one scored chain per candidate minCount, UNION
    * ALL'd; each branch scopes its CTEs inside a derived table so the
    * names never collide. */
  def oracleMinCountCurveSql(
      alpha: Double = 0.4,
      minCounts: Seq[Long] = Seq(1L, 2L, 4L, 8L)): String =
    minCounts.map { mc =>
      s"""SELECT * FROM (
         |WITH ${scoredCtes(alpha, mc)}
         |SELECT CAST($mc AS BIGINT) AS min_count,
         |       (SELECT count(*)::BIGINT FROM c3) AS tri_table_rows,
         |       (SELECT count(*)::BIGINT FROM c2) AS bi_table_rows,
         |       count(*)::BIGINT AS n_tokens,
         |       ${PortableRound.floorToSql(
          "CAST(sum(CASE WHEN lvl = 'tri' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS tri_rate,
         |       ${PortableRound.floorToSql(
          "CAST(sum(CASE WHEN lvl = 'bi' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS bi_rate,
         |       ${PortableRound.floorToSql(
          "-CAST(sum(lp) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 4)} AS ce
         |FROM j) mc$mc""".stripMargin
    }.mkString("\nUNION ALL\n")

  // ---- DuckDB oracles ----

  private val normSql =
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Shared CTE chain: tokenized stream with lag contexts, the three
    * count tables, and the per-token (lvl, lp) scoring join — the
    * literal SQL rendering of [[scoredTokens]]. */
  private def scoredCtes(alpha: Double, minCount: Long): String = {
    val lnA = alphaMicro(alpha)
    s"""n AS (SELECT doc_id, lang,
       |        string_split($normSql, ' ') AS toks
       |      FROM documents),
       |tk AS (SELECT doc_id, lang, CAST(i AS INT) AS pos, list_extract(toks, i) AS term
       |       FROM (SELECT doc_id, lang, toks, unnest(range(1, len(toks) + 1)) AS i
       |             FROM n) z),
       |s AS (SELECT doc_id, lang, pos, term,
       |        lag(term, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS p1,
       |        lag(term, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS p2
       |      FROM tk),
       |c1 AS (SELECT term, count(*)::BIGINT AS n1 FROM tk GROUP BY term),
       |tot AS (SELECT CAST(sum(n1) AS DOUBLE) AS total FROM c1),
       |c2 AS (SELECT p1, term, count(*)::BIGINT AS n2 FROM s
       |       WHERE p1 IS NOT NULL GROUP BY p1, term
       |       HAVING count(*) >= $minCount),
       |c3 AS (SELECT p2, p1, term, count(*)::BIGINT AS n3 FROM s
       |       WHERE p2 IS NOT NULL GROUP BY p2, p1, term
       |       HAVING count(*) >= $minCount),
       |j AS (SELECT s.doc_id, s.lang, s.pos,
       |        CASE WHEN t3.n3 IS NOT NULL THEN 'tri'
       |             WHEN b2.n2 IS NOT NULL THEN 'bi'
       |             ELSE 'uni' END AS lvl,
       |        CASE WHEN t3.n3 IS NOT NULL
       |               THEN CAST(floor(ln(CAST(t3.n3 AS DOUBLE) / CAST(x2.n2 AS DOUBLE)) * 1000000.0) AS BIGINT)
       |             WHEN b2.n2 IS NOT NULL
       |               THEN CAST(floor(ln(CAST(b2.n2 AS DOUBLE) / CAST(y1.n1 AS DOUBLE)) * 1000000.0) AS BIGINT)
       |                    + CASE WHEN s.p2 IS NOT NULL THEN $lnA ELSE 0 END
       |             ELSE CAST(floor(ln(CAST(u.n1 AS DOUBLE) / tot.total) * 1000000.0) AS BIGINT)
       |                  + CASE WHEN s.p2 IS NOT NULL THEN ${2 * lnA}
       |                         WHEN s.p1 IS NOT NULL THEN $lnA
       |                         ELSE 0 END
       |        END AS lp
       |      FROM s
       |      LEFT JOIN c3 t3 ON t3.p2 = s.p2 AND t3.p1 = s.p1 AND t3.term = s.term
       |      LEFT JOIN c2 x2 ON x2.p1 = s.p2 AND x2.term = s.p1
       |      LEFT JOIN c2 b2 ON b2.p1 = s.p1 AND b2.term = s.term
       |      LEFT JOIN c1 y1 ON y1.term = s.p1
       |      JOIN c1 u ON u.term = s.term, tot)""".stripMargin
  }

  /** qt52 oracle — literal SQL twin of [[score]]. */
  def oracleScoreSql(
      alpha: Double = 0.4, tau: Double = 8.0, minCount: Long = 1): String =
    s"""WITH ${scoredCtes(alpha, minCount)}
       |SELECT doc_id AS id, count(*)::BIGINT AS n_tokens,
       |       CAST(sum(CASE WHEN lvl = 'tri' THEN 1 ELSE 0 END) AS BIGINT) AS tri_hits,
       |       CAST(sum(CASE WHEN lvl = 'bi' THEN 1 ELSE 0 END) AS BIGINT) AS bi_hits,
       |       CAST(sum(CASE WHEN lvl = 'uni' THEN 1 ELSE 0 END) AS BIGINT) AS uni_hits,
       |       ${PortableRound.floorToSql(
            "-CAST(sum(lp) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 4)} AS ce,
       |       ${PortableRound.floorToSql(
            "-CAST(sum(lp) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 4)} <= $tau AS keep
       |FROM j GROUP BY doc_id""".stripMargin

  /** qt53 oracle — literal SQL twin of [[coverage]]. */
  def oracleCoverageSql(alpha: Double = 0.4, minCount: Long = 1): String =
    s"""WITH ${scoredCtes(alpha, minCount)}
       |SELECT lang,
       |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       count(*)::BIGINT AS n_tokens,
       |       ${PortableRound.floorToSql(
            "CAST(sum(CASE WHEN lvl = 'tri' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS tri_rate,
       |       ${PortableRound.floorToSql(
            "CAST(sum(CASE WHEN lvl = 'bi' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS bi_rate,
       |       ${PortableRound.floorToSql(
            "CAST(sum(CASE WHEN lvl = 'uni' THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS uni_rate,
       |       ${PortableRound.floorToSql(
            "-CAST(sum(lp) AS DOUBLE) / 1000000.0 / CAST(count(*) AS DOUBLE)", 4)} AS ce
       |FROM j GROUP BY lang""".stripMargin
}
