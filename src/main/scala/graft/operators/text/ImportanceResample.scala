package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{PortableRound, TextOps}

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
  * select raw-corpus documents whose HASHED N-GRAM distribution looks
  * like a target domain. Both the target slice and the full corpus are
  * reduced to a B-bucket multinomial over hashed unigram+bigram
  * features; each document's importance weight is its log-likelihood
  * ratio under the two multinomials,
  *
  *   w(d) = sum over feature occurrences f in d of
  *          [ ln p_target(bucket(f)) - ln p_raw(bucket(f)) ]
  *
  * (Laplace-smoothed), and resampling keeps the top-k by weight. This
  * is the distribution-MATCHING selector in the curation ladder —
  * unlike a quality score it has no notion of "good", only "like the
  * target".
  *
  * Scale shape: the model is ONE B-row bucket table (B ~ 10^3-10^4)
  * built by a single map-side-combined aggregation over exploded
  * features, then BROADCAST back onto the feature stream; the per-doc
  * rollup is the only other shuffle (narrow (id, bucket) rows, integer
  * sums). Nothing is ever quadratic and no driver-side state exists at
  * any corpus size; top-k is a TakeOrdered, never a global sort.
  *
  * Portability: bucket = md5-prefix mod B (bit-identical in both
  * engines); bucket log-probs are floor-scaled integer MICRO-NATS of
  * exact BIGINT-ratio divisions, so document weights are order-free
  * integer sums and ties resample identically under the (weight DESC,
  * id) cut.
  */
object ImportanceResample {

  /** Hashed unigram+bigram feature buckets of the normalized text —
    * an array<long> WITH multiplicity (DSIR counts occurrences, not
    * distinct features). */
  def featureBuckets(text: Column, buckets: Int): Column = {
    val t = TextOps.tokens(text)
    val bigrams = zip_with(
      slice(t, lit(1), size(t) - 1), slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))
    transform(concat(t, bigrams),
      f => conv(substring(md5(f), 1, 8), 16, 10).cast("long") % buckets)
  }

  /** Per-document importance weights: (id, n_feats, lr_micro,
    * avg_logratio) — lr_micro is the EXACT integer micro-nat
    * log-likelihood-ratio sum, avg_logratio its 4-dp per-feature mean.
    * `target` marks the rows whose feature distribution defines the
    * target domain; `smoothing` is the Laplace pseudo-count. */
  def weights(
      df: DataFrame,
      text: Column,
      id: Column,
      target: Column,
      buckets: Int = 1024,
      smoothing: Long = 1L): DataFrame = {
    require(buckets >= 2, s"bad buckets $buckets")
    require(smoothing >= 1, s"bad smoothing $smoothing")
    val feats = graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), target.as("is_t"),
        explode(featureBuckets(text, buckets)).as("b"))
    val bt = feats.groupBy("b").agg(
      sum(when(col("is_t"), 1L).otherwise(0L)).as("ct"),
      count(lit(1)).as("cr"))
    val tot = bt.agg(
      sum("ct").as("tt"), sum("cr").as("tr"))
    val micro = (n: Column, t: Column) =>
      floor(log((n.cast("double") + lit(smoothing.toDouble)) /
        (t.cast("double") + lit((smoothing * buckets).toDouble))) * lit(1e6))
        .cast("long")
    val probs = bt.crossJoin(broadcast(tot)).select(
      col("b"),
      micro(col("ct"), col("tt")).as("lt"),
      micro(col("cr"), col("tr")).as("lr"))
    scoreByModel(df, text, id, buckets, probs)
  }

  /** Score every document against a B-row (b, lt, lr) bucket model:
    * the model folds into ONE broadcast row (bucket → lt−lr map) and
    * each document sums its own feature array through it in place —
    * same integer micro-nat values as the former explode →
    * broadcast-join → groupBy(id) rollup (every document bucket is in
    * the model by construction, and the sum is order-free), but the
    * scoring pass is map-only: the per-doc shuffle of the whole
    * (id, bucket) feature stream is gone (guide §2.4). */
  private def scoreByModel(
      df: DataFrame,
      text: Column,
      id: Column,
      buckets: Int,
      probs: DataFrame): DataFrame = {
    // DENSE delta array indexed by bucket, not a map: Spark map lookup
    // (GetMapValue) is a linear scan, O(B) per feature — the bucket id
    // is already a perfect array index, so the one-row model projects
    // its map into a length-B array once and scoring pays O(1) per
    // feature. Buckets unseen by the model (possible only for buckets
    // no document's features hit — never actually indexed) fill 0.
    val model = probs.agg(
      map_from_entries(
        collect_list(struct(col("b"), (col("lt") - col("lr")).as("d"))))
        .as("dm"))
      .select(transform(sequence(lit(0L), lit(buckets - 1L)),
        i => coalesce(element_at(col("dm"), i), lit(0L))).as("da"))
    graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), featureBuckets(text, buckets).as("__f"))
      .where(col("__f").isNotNull) // null text exploded to no rows before
      .crossJoin(broadcast(model))
      .select(
        col("id"),
        size(col("__f")).cast("bigint").as("n_feats"),
        aggregate(
          transform(col("__f"),
            b => element_at(col("da"), (b + lit(1L)).cast("int"))),
          lit(0L),
          (acc, x) => acc + x).cast("bigint").as("lr_micro"))
      .select(
        col("id"), col("n_feats"), col("lr_micro"),
        PortableRound.floorTo(
          col("lr_micro").cast("double") / lit(1e6) /
            col("n_feats").cast("double"), 4).as("avg_logratio"))
  }

  /** Cross-corpus weights — the real-world DSIR shape: the target
    * distribution comes from a SEPARATE corpus (e.g. "select web
    * docs that look like the wiki table"), the raw distribution from
    * the corpus being scored. When the target rows are a subset of
    * `raw`, this is algebraically identical to [[weights]] with a
    * membership predicate (the spec proves the equivalence). */
  def weightsAgainst(
      raw: DataFrame,
      rawText: Column,
      rawId: Column,
      target: DataFrame,
      targetText: Column,
      buckets: Int = 1024,
      smoothing: Long = 1L): DataFrame = {
    require(buckets >= 2, s"bad buckets $buckets")
    require(smoothing >= 1, s"bad smoothing $smoothing")
    val rawFeats = graft.operators.Parallelism.ensureMin(raw)
      .select(rawId.as("id"),
        explode(featureBuckets(rawText, buckets)).as("b"))
    val cr = rawFeats.groupBy("b").agg(count(lit(1)).as("cr"))
    val ct = graft.operators.Parallelism.ensureMin(target)
      .select(explode(featureBuckets(targetText, buckets)).as("b"))
      .groupBy("b").agg(count(lit(1)).as("ct"))
    val bt = cr.join(ct, Seq("b"), "full_outer")
      .select(col("b"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val tot = bt.agg(sum("ct").as("tt"), sum("cr").as("tr"))
    val micro = (n: Column, t: Column) =>
      floor(log((n.cast("double") + lit(smoothing.toDouble)) /
        (t.cast("double") + lit((smoothing * buckets).toDouble))) * lit(1e6))
        .cast("long")
    val probs = bt.crossJoin(broadcast(tot)).select(
      col("b"),
      micro(col("ct"), col("tt")).as("lt"),
      micro(col("cr"), col("tr")).as("lr"))
    scoreByModel(raw, rawText, rawId, buckets, probs)
  }

  /** Resample top-k by (weight DESC, id) and report how the selection
    * shifts the `strata` distribution: (stratum, n_docs, n_selected,
    * sel_rate). The k cut is deterministic — integer weights with the
    * id tiebreak. */
  def sampleSummary(
      df: DataFrame,
      text: Column,
      id: Column,
      strata: Column,
      target: Column,
      buckets: Int = 1024,
      smoothing: Long = 1L,
      k: Int = 100): DataFrame = {
    require(k >= 1, s"bad k $k")
    val w = weights(df, text, id, target, buckets, smoothing)
    val sel = w.orderBy(col("lr_micro").desc, col("id")).limit(k)
      .select(col("id"))
    val docs = df.select(id.as("id"), strata.as("stratum"))
    docs
      .join(sel.withColumn("hit", lit(1L)), Seq("id"), "left")
      .groupBy("stratum")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_selected"))
      .select(
        col("stratum"),
        col("n_docs").cast("bigint").as("n_docs"),
        col("n_selected").cast("bigint").as("n_selected"),
        PortableRound.floorTo(
          col("n_selected").cast("double") / col("n_docs").cast("double"),
          4).as("sel_rate"))
  }

  /** Deterministic Gumbel noise in integer micro-nats, keyed by id:
    * G = −ln(−ln u) with u = (2·md5₅₂(id)+1)/2^53 — the odd-numerator
    * power-of-two division is EXACT IEEE, so u (and hence G) is
    * bit-identical in any engine. */
  def gumbelMicro(id: Column, tau: Double): Column = {
    val h = conv(substring(md5(id.cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (h * lit(2L) + lit(1L)).cast("double") / lit(9007199254740992.0)
    floor(lit(tau) * -log(-log(u)) * lit(1e6)).cast("long")
  }

  /** The paper's actual resampling step — Gumbel top-k: rank by
    * lr + G (equivalently, sample without replacement with
    * probability ∝ exp(lr/τ)), made deterministic and engine-portable
    * by md5-derived uniforms. Softer than [[sampleSummary]]'s argmax
    * cut: off-target docs keep a weight-proportional chance. Same
    * output shape: (stratum, n_docs, n_selected, sel_rate). */
  def gumbelSampleSummary(
      df: DataFrame,
      text: Column,
      id: Column,
      strata: Column,
      target: Column,
      buckets: Int = 1024,
      smoothing: Long = 1L,
      k: Int = 100,
      tau: Double = 1.0): DataFrame = {
    require(k >= 1 && tau > 0, s"bad k=$k tau=$tau")
    val w = weights(df, text, id, target, buckets, smoothing)
      .withColumn("key", col("lr_micro") + gumbelMicro(col("id"), tau))
    val sel = w.orderBy(col("key").desc, col("id")).limit(k)
      .select(col("id"))
    val docs = df.select(id.as("id"), strata.as("stratum"))
    docs
      .join(sel.withColumn("hit", lit(1L)), Seq("id"), "left")
      .groupBy("stratum")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(coalesce(col("hit"), lit(0L))).as("n_selected"))
      .select(
        col("stratum"),
        col("n_docs").cast("bigint").as("n_docs"),
        col("n_selected").cast("bigint").as("n_selected"),
        PortableRound.floorTo(
          col("n_selected").cast("double") / col("n_docs").cast("double"),
          4).as("sel_rate"))
  }

  // ---- DuckDB oracles ----

  private val normSql =
    "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"

  /** Shared CTE chain: hashed feature stream, bucket multinomials and
    * the per-doc integer weight rollup — the literal SQL rendering of
    * [[weights]]. `targetSql` is the target predicate over `documents`
    * columns (e.g. "lang = 'en'"). */
  private def weightCtes(
      targetSql: String, buckets: Int, smoothing: Long): String =
    s"""dsir_n AS (SELECT doc_id, ($targetSql) AS is_t,
       |        string_split($normSql, ' ') AS toks
       |      FROM documents),
       |dsir_fs AS (SELECT doc_id, is_t, unnest(toks) AS f FROM dsir_n
       |       UNION ALL
       |       SELECT doc_id, is_t,
       |              unnest(list_transform(range(1, len(toks)),
       |                                    i -> toks[i] || ' ' || toks[i + 1])) AS f
       |       FROM dsir_n),
       |dsir_feats AS (SELECT doc_id, is_t,
       |            CAST(('0x' || substring(md5(f), 1, 8)) AS BIGINT) % $buckets AS b
       |          FROM dsir_fs),
       |dsir_bt AS (SELECT b,
       |         CAST(sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS BIGINT) AS ct,
       |         count(*)::BIGINT AS cr
       |       FROM dsir_feats GROUP BY b),
       |dsir_tot AS (SELECT CAST(sum(ct) AS BIGINT) AS tt,
       |               CAST(sum(cr) AS BIGINT) AS tr FROM dsir_bt),
       |dsir_probs AS (SELECT b,
       |            CAST(floor(ln((CAST(ct AS DOUBLE) + $smoothing.0) /
       |                          (CAST(tt AS DOUBLE) + ${smoothing * buckets}.0)) * 1000000.0) AS BIGINT) AS lt,
       |            CAST(floor(ln((CAST(cr AS DOUBLE) + $smoothing.0) /
       |                          (CAST(tr AS DOUBLE) + ${smoothing * buckets}.0)) * 1000000.0) AS BIGINT) AS lr
       |          FROM dsir_bt, dsir_tot),
       |dsir_w AS (SELECT dsir_feats.doc_id AS id, count(*)::BIGINT AS n_feats,
       |        CAST(sum(dsir_probs.lt - dsir_probs.lr) AS BIGINT) AS lr_micro
       |      FROM dsir_feats JOIN dsir_probs USING (b)
       |      GROUP BY dsir_feats.doc_id)""".stripMargin

  /** Composable CTE chain ending in `dsel` — the selected documents
    * (full rows), for oracles that pipeline DSIR selection into
    * downstream stages (qp22 re-roots the curation chain on it). */
  def selectionCtes(
      targetSql: String,
      buckets: Int = 1024,
      smoothing: Long = 1L,
      k: Int = 100): String =
    s"""${weightCtes(targetSql, buckets, smoothing)},
       |dsir_sel AS (SELECT id FROM dsir_w ORDER BY lr_micro DESC, id LIMIT $k),
       |dsel AS (SELECT d.* FROM documents d
       |         JOIN dsir_sel ON dsir_sel.id = d.doc_id)""".stripMargin

  /** qp20 oracle — literal SQL twin of [[weights]]. */
  def oracleWeightsSql(
      targetSql: String, buckets: Int = 1024, smoothing: Long = 1L): String =
    s"""WITH ${weightCtes(targetSql, buckets, smoothing)}
       |SELECT id, n_feats, lr_micro,
       |       ${PortableRound.floorToSql(
          "CAST(lr_micro AS DOUBLE) / 1000000.0 / CAST(n_feats AS DOUBLE)", 4)} AS avg_logratio
       |FROM dsir_w""".stripMargin

  /** qp21 oracle — literal SQL twin of [[sampleSummary]]. */
  def oracleSampleSql(
      targetSql: String,
      strataCol: String,
      buckets: Int = 1024,
      smoothing: Long = 1L,
      k: Int = 100): String =
    s"""WITH ${weightCtes(targetSql, buckets, smoothing)},
       |sel AS (SELECT id FROM dsir_w ORDER BY lr_micro DESC, id LIMIT $k)
       |SELECT d.$strataCol AS stratum,
       |       count(*)::BIGINT AS n_docs,
       |       CAST(sum(CASE WHEN sel.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |       ${PortableRound.floorToSql(
          "CAST(sum(CASE WHEN sel.id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS sel_rate
       |FROM documents d LEFT JOIN sel ON sel.id = d.doc_id
       |GROUP BY d.$strataCol""".stripMargin

  /** qp23 oracle — literal SQL twin of [[gumbelSampleSummary]]. */
  def oracleGumbelSampleSql(
      targetSql: String,
      strataCol: String,
      buckets: Int = 1024,
      smoothing: Long = 1L,
      k: Int = 100,
      tau: Double = 1.0): String =
    s"""WITH ${weightCtes(targetSql, buckets, smoothing)},
       |keyed AS (
       |  SELECT id, lr_micro +
       |         CAST(floor($tau * -ln(-ln(
       |           CAST(2 * CAST(('0x' || substring(md5(CAST(id AS VARCHAR)), 1, 13)) AS BIGINT) + 1 AS DOUBLE)
       |             / 9007199254740992.0)) * 1000000.0) AS BIGINT) AS key
       |  FROM dsir_w),
       |sel AS (SELECT id FROM keyed ORDER BY key DESC, id LIMIT $k)
       |SELECT d.$strataCol AS stratum,
       |       count(*)::BIGINT AS n_docs,
       |       CAST(sum(CASE WHEN sel.id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |       ${PortableRound.floorToSql(
          "CAST(sum(CASE WHEN sel.id IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)} AS sel_rate
       |FROM documents d LEFT JOIN sel ON sel.id = d.doc_id
       |GROUP BY d.$strataCol""".stripMargin
}
