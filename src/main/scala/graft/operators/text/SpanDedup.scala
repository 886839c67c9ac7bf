package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{Barrier, TextOps}

/** Exact duplicated-span detection — the substring-level complement of
  * document-level dedup (reference has nothing like it; this is the
  * "dedup training data at the span level" step of an LLM corpus
  * pipeline, after whole-doc and near-dup passes).
  *
  * A span is a token n-gram. A span is DUPLICATED when it occurs in at
  * least `minDocs` distinct documents; a document's `dup_ratio` is the
  * fraction of its distinct spans that are duplicated. High-ratio
  * documents are boilerplate/template copies that near-dup sketches can
  * miss when the copied region is a small part of a long document.
  *
  * Scale shape: one explode to (doc, md5(span)) rows — narrow, the md5
  * replaces the n-token text so span bytes never shuffle — then one
  * hash aggregation for the shared-span set and one hash join back.
  * Nothing quadratic; the span table is the same cardinality class as
  * the token stream itself. The exploded table crosses a [[Barrier]]
  * because both the aggregation and the join consume it.
  *
  * Portable by construction: spans hash with md5 over the same
  * normalized text both engines see, so the whole profile is
  * DuckDB-oracle-able (no seeded families anywhere).
  */
object SpanDedup {

  /** md5 keys of the document's DISTINCT token n-gram spans. Documents
    * shorter than `n` tokens contribute their whole token stream as one
    * span (the `greatest(len-n+1, 1)` convention shared with
    * [[TextOps.charShingles]]). */
  def spanKeys(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    array_distinct(
      transform(
        sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
        i => md5(concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Per-document span profile:
    * (id, n_spans, shared_spans, dup_ratio rounded to 4).
    *
    * Skew safety at corpus scale, mirroring `MinHashLSH.maxBucket`
    * (MinHashLSH.scala:90-95): a boilerplate span occurring in
    * millions of documents must not funnel all its (span, doc) rows
    * through one reducer. Two defenses:
    *
    *   - the per-span document count is a plain `count(*)` — exact
    *     because [[spanKeys]] is distinct per document AND the input
    *     carries one row per document id (PRECONDITION: duplicate ids
    *     would inflate every one of their spans' counts; run exact
    *     dedup first, as every pipeline here does — `countDistinct`
    *     would tolerate duplicate ids but ships every (span, doc) pair
    *     through the shuffle, the skew this design removes);
    *   - spans in more than `maxDocs` documents are boilerplate BY
    *     DEFINITION (maxDocs >= minDocs, so they are shared without
    *     needing enumeration): their keys form a tiny broadcast
    *     overflow list, and their rows are flagged by a broadcast join
    *     and routed AROUND the g-keyed shuffle join, whose remaining
    *     per-key fan-in is bounded by maxDocs.
    */
  def spanProfile(
      df: DataFrame,
      text: Column,
      id: Column,
      n: Int = 8,
      minDocs: Int = 2,
      maxDocs: Int = 1000000): DataFrame = {
    require(maxDocs >= minDocs,
      s"maxDocs ($maxDocs) must be >= minDocs ($minDocs): a span past " +
        "the cap is counted as shared without enumeration")
    // the span stream is keyed by g at its barrier (r20): the count
    // aggregation and the shared-span join both consume it by g, so
    // surfacing the partitioning elides their exchanges — one span-
    // stream shuffle where each keyed consumer used to pay its own
    val exploded = Barrier.keyed(
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"), explode(spanKeys(text, n)).as("g")), "g")
    // materialized once (r20): hot and shared both derive from it, and
    // without the barrier each consumer re-ran the full aggregation
    // over the span stream (the r19 qt13 plan carried THREE copies of
    // this agg — guide §1.2, don't compute things twice); g-partitioned
    // input makes the agg map-side only, and the surfaced layout keeps
    // the shared-span join exchange-free on both sides
    val counts = Barrier(exploded.groupBy("g").agg(count(lit(1)).as("nd")))
    val hot = counts.filter(col("nd") > maxDocs)
      .select(col("g"), lit(1).as("hot"))
    val shared = counts
      .filter(col("nd") >= minDocs && col("nd") <= maxDocs)
      .select(col("g"), lit(1).as("sh"))
    val flagged = exploded.join(broadcast(hot), Seq("g"), "left")
    val viaHot = flagged.filter(col("hot") === 1)
      .select(col("id"), lit(1).as("sh"))
    val viaJoin = flagged.filter(col("hot").isNull)
      .join(shared, Seq("g"), "left")
      .select(col("id"), col("sh"))
    viaHot
      .unionByName(viaJoin)
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_spans"),
        count(col("sh")).as("shared_spans"))
      .withColumn("dup_ratio",
        graft.operators.PortableRound.floorTo(
          col("shared_spans").cast("double") / col("n_spans"), 4))
  }

  /** Documents whose duplicated-span ratio stays at or below
    * `maxRatio` — the keep-side filter for span-level cleaning. */
  def dropSpanHeavy(
      df: DataFrame,
      text: Column,
      idCol: String,
      maxRatio: Double,
      n: Int = 8,
      minDocs: Int = 2,
      maxDocs: Int = 1000000): DataFrame = {
    val heavy = spanProfile(df, text, col(idCol), n, minDocs, maxDocs)
      .filter(col("dup_ratio") > maxRatio)
      .select(col("id").as(idCol))
    df.join(heavy, Seq(idCol), "left_anti")
  }

  /** POSITIONAL span keys — every n-gram window in order, duplicates
    * kept (the run-structure complement of [[spanKeys]]). */
  def posSpanKeys(text: Column, n: Int): Column = {
    val toks = TextOps.tokens(text)
    transform(
      sequence(lit(1), greatest(size(toks) - lit(n - 1), lit(1))),
      i => md5(concat_ws(" ", slice(toks, i, lit(n)))))
  }

  /** Longest duplicated RUN per document (the ExactSubstr signal of
    * Lee et al.'s training-data dedup): how LONG is the longest
    * contiguous region of corpus-duplicated n-grams, not just what
    * fraction is duplicated ([[spanProfile]]'s `dup_ratio`). A doc
    * with `max_run` = r carries a verbatim-shared region of r+n-1
    * tokens — template pages and quoted blocks score high here while
    * keeping a low overall ratio in long documents.
    *
    * Returns (id, n_pos, dup_pos, max_run). Runs are found with the
    * gaps-and-islands trick — `pos − row_number()` over the flagged
    * positions groups each maximal run — pure integer window work both
    * engines evaluate identically. Scale shape: the positional span
    * table is token-stream-sized narrow rows; corpus counts use
    * one-vote-per-doc pair-distinct ([[LineDedup]]'s skew-safe shape);
    * over-`maxDocs` spans route around the keyed join via a broadcast
    * hot list exactly as [[spanProfile]] does. */
  def longestRunProfile(
      df: DataFrame,
      text: Column,
      id: Column,
      n: Int = 8,
      minDocs: Int = 2,
      maxDocs: Int = 1000000): DataFrame = {
    require(maxDocs >= minDocs,
      s"maxDocs ($maxDocs) must be >= minDocs ($minDocs)")
    import org.apache.spark.sql.expressions.Window
    // keyed barriers (r20), same rationale as [[spanProfile]]: the
    // positional stream is keyed by g (one-vote distinct, counts and
    // the shared join all cluster by g — g ⊆ {id, g} satisfies the
    // distinct's clustering too, so its exchange elides as well)
    val ps = Barrier.keyed(
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"), posexplode(posSpanKeys(text, n)).as(Seq("pos", "g"))),
      "g")
    val counts = Barrier(ps.select("id", "g").distinct()
      .groupBy("g").agg(count(lit(1)).as("nd")))
    val hot = counts.filter(col("nd") > maxDocs)
      .select(col("g"), lit(1).as("hot"))
    val shared = counts
      .filter(col("nd") >= minDocs && col("nd") <= maxDocs)
      .select(col("g"), lit(1).as("sh"))
    val preFlag = ps.join(broadcast(hot), Seq("g"), "left")
    // the flag stream is keyed by id: the gaps-and-islands window, the
    // per-doc aggregate and the runs join all cluster by id — one
    // id-shuffle at the barrier where each used to pay its own
    val flagged = Barrier.keyed(
      preFlag.filter(col("hot") === 1)
        .select(col("id"), col("pos"), lit(1).as("fl"))
        .unionByName(
          preFlag.filter(col("hot").isNull)
            .join(shared, Seq("g"), "left")
            .select(col("id"), col("pos"),
              when(col("sh") === 1, lit(1)).otherwise(lit(0)).as("fl"))),
      "id")
    val w = Window.partitionBy("id").orderBy("pos")
    val runs = flagged.filter(col("fl") === 1)
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy("id", "grp").agg(count(lit(1)).as("rl"))
      .groupBy("id").agg(max("rl").as("mx"))
    flagged.groupBy("id")
      .agg(count(lit(1)).as("n_pos"), sum("fl").cast("long").as("dup_pos"))
      .join(runs, Seq("id"), "left")
      .select(col("id"), col("n_pos"), col("dup_pos"),
        coalesce(col("mx"), lit(0L)).as("max_run"))
  }

  /** DuckDB formulation of [[longestRunProfile]]: same positional
    * spans, one-vote counts, gaps-and-islands runs. */
  def oracleRunSql(n: Int = 8, minDocs: Int = 2): String =
    s"""WITH nrm AS (SELECT doc_id,
       |               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
       |             FROM documents),
       |tk AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM nrm),
       |ps AS (SELECT doc_id, CAST(i AS INT) AS pos,
       |              md5(list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ')) AS g
       |       FROM (SELECT doc_id, toks,
       |               unnest(range(1, greatest(len(toks) - ${n - 1}, 1) + 1)) AS i
       |             FROM tk) z),
       |cnt AS (SELECT g, count(*) AS nd
       |        FROM (SELECT DISTINCT doc_id, g FROM ps) d GROUP BY g),
       |sh AS (SELECT g FROM cnt WHERE nd >= $minDocs),
       |fl AS (SELECT ps.doc_id, ps.pos,
       |              CASE WHEN sh.g IS NULL THEN 0 ELSE 1 END AS fl
       |       FROM ps LEFT JOIN sh ON ps.g = sh.g),
       |runs AS (SELECT doc_id, count(*) AS rl FROM (
       |           SELECT doc_id, pos,
       |                  pos - row_number() OVER (PARTITION BY doc_id
       |                                           ORDER BY pos) AS grp
       |           FROM fl WHERE fl = 1) z GROUP BY doc_id, grp),
       |mr AS (SELECT doc_id, max(rl) AS mx FROM runs GROUP BY doc_id),
       |agg AS (SELECT doc_id, count(*) AS n_pos, sum(fl)::BIGINT AS dup_pos
       |        FROM fl GROUP BY doc_id)
       |SELECT agg.doc_id AS id, n_pos, dup_pos,
       |       coalesce(mx, 0)::BIGINT AS max_run
       |FROM agg LEFT JOIN mr ON agg.doc_id = mr.doc_id""".stripMargin

  /** The CTE chain of [[spanProfile]] rooted on `from` (a table or
    * prior CTE with doc_id + text), ending in
    * `span_prof(id, n_spans, shared_spans, dup_ratio)` — spliceable
    * into composed pipelines (see CorpusPipeline). Same normalization,
    * same md5 span keys, same greatest() short-doc convention as the
    * Spark side. */
  def profileCtes(from: String, n: Int = 8, minDocs: Int = 2): String =
    s"""sd_nrm AS (SELECT doc_id,
       |             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt
       |           FROM $from),
       |sd_t AS (SELECT doc_id, string_split(nt, ' ') AS toks FROM sd_nrm),
       |sd_g AS (SELECT doc_id,
       |        list_distinct(list_transform(
       |          range(1, greatest(len(toks) - ${n - 1}, 1) + 1),
       |          i -> md5(list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ')))) AS gs
       |      FROM sd_t),
       |sd_e AS (SELECT doc_id, unnest(gs) AS g FROM sd_g),
       |sd_s AS (SELECT g FROM sd_e GROUP BY g HAVING count(DISTINCT doc_id) >= $minDocs),
       |span_prof AS (
       |  SELECT sd_e.doc_id AS id, count(*) AS n_spans, count(sd_s.g) AS shared_spans,
       |         ${graft.operators.PortableRound.floorToSql("count(sd_s.g)::DOUBLE / count(*)", 4)} AS dup_ratio
       |  FROM sd_e LEFT JOIN sd_s ON sd_e.g = sd_s.g
       |  GROUP BY sd_e.doc_id)""".stripMargin

  /** The standalone DuckDB formulation of [[spanProfile]]. */
  def oracleSql(n: Int = 8, minDocs: Int = 2): String =
    s"""WITH ${profileCtes("documents", n, minDocs)}
       |SELECT id, n_spans, shared_spans, dup_ratio FROM span_prof""".stripMargin
}
