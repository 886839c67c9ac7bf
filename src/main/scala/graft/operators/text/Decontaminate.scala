package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag (and drop) training documents that
  * overlap an evaluation/benchmark set at the token-n-gram level. The
  * standard pre-training hygiene step: a training document sharing even
  * one long n-gram with a benchmark item leaks the benchmark into the
  * model, so contaminated documents are removed before training.
  * (No reference analog — the reference replicates tables; this is part
  * of the LLM-pipeline surface this engine adds on top.)
  *
  * Span keys are the md5 token-n-gram keys of [[SpanDedup.spanKeys]] —
  * the span TEXT never leaves the row; only 32-char digests move.
  *
  * Scale shape (the reason this formulation wins at 100 TB): benchmark
  * sets are small (thousands to a few million n-grams) while the corpus
  * is the 100 TB side, so the benchmark key set is the BROADCAST side of
  * a hash join against the corpus's exploded span stream. The corpus
  * side is one narrow explode (no redistribution — a document's spans
  * stay in its partition), the contamination test is a broadcast hash
  * join (zero shuffle), and the per-document rollup is an algebraic
  * `count` that partial-aggregates map-side, collapsing each document to
  * one row per task before the only shuffle in the plan (keyed by doc
  * id — uniform by construction, no hot keys possible).
  */
object Decontaminate {

  /** The benchmark side: distinct md5 keys of the eval set's token
    * n-grams, one `g` column — small by assumption, broadcast by
    * [[profile]]. Deduplication happens on the small side so repeated
    * benchmark boilerplate costs nothing against the corpus. */
  def benchmarkKeys(bench: DataFrame, text: Column, n: Int = 8): DataFrame =
    bench.select(explode(SpanDedup.spanKeys(text, n)).as("g")).distinct()

  /** Per-document contamination profile:
    * (id, n_spans, dirty_spans, contaminated).
    *
    * `n_spans` counts the document's distinct spans, `dirty_spans` the
    * ones that also occur in the benchmark set; `contaminated` is the
    * drop signal (any overlap at all — the conservative standard). */
  def profile(
      corpus: DataFrame,
      text: Column,
      id: Column,
      benchKeys: DataFrame,
      n: Int = 8): DataFrame = {
    val spans = graft.operators.Parallelism.ensureMin(corpus)
      .select(id.as("id"), explode(SpanDedup.spanKeys(text, n)).as("g"))
    spans
      .join(broadcast(benchKeys.withColumn("hit", lit(1))), Seq("g"), "left")
      .groupBy("id")
      .agg(
        count(lit(1)).as("n_spans"),
        count(col("hit")).as("dirty_spans"))
      .withColumn("contaminated", col("dirty_spans") > 0)
  }

  /** Just the contaminated ids — the seed set for transitive
    * expansion (qp06): a broadcast LEFT SEMI against the benchmark
    * keys plus an id distinct, skipping [[profile]]'s per-document
    * span counting entirely. The span stream short-circuits at the
    * first benchmark hit instead of being counted to the end. */
  def contaminatedIds(
      corpus: DataFrame,
      text: Column,
      id: Column,
      benchKeys: DataFrame,
      n: Int = 8): DataFrame =
    graft.operators.Parallelism.ensureMin(corpus)
      .select(id.as("id"), explode(SpanDedup.spanKeys(text, n)).as("g"))
      .join(broadcast(benchKeys), Seq("g"), "left_semi")
      .select("id").distinct()

  /** The keep-side filter: corpus rows whose document shares NO span
    * with the benchmark set. Anti-join on the contaminated id list —
    * the id list is tiny relative to the corpus, so AQE plans it as a
    * broadcast anti-join. */
  def dropContaminated(
      corpus: DataFrame,
      text: Column,
      idCol: String,
      benchKeys: DataFrame,
      n: Int = 8): DataFrame = {
    val dirty = profile(corpus, text, col(idCol), benchKeys, n)
      .filter(col("contaminated"))
      .select(col("id").as(idCol))
    corpus.join(dirty, Seq(idCol), "left_anti")
  }

  /** DuckDB formulation of the qt15 query: eval set = the 'test'
    * hash-split bucket of `documents` (CorpusOps.splitBucket >= 90),
    * corpus = the 'train' bucket (< 80); same md5 span keys, same
    * short-document convention as the Spark side. */
  def oracleSql(n: Int = 8): String =
    s"""WITH nrm AS (SELECT doc_id,
       |               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt,
       |               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
       |             FROM documents),
       |tk AS (SELECT doc_id, b, string_split(nt, ' ') AS toks FROM nrm),
       |gs AS (SELECT doc_id, b,
       |              list_distinct(list_transform(
       |                range(1, greatest(len(toks) - ${n - 1}, 1) + 1),
       |                i -> md5(list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ')))) AS g
       |       FROM tk),
       |e AS (SELECT doc_id, b, unnest(g) AS g FROM gs),
       |bench AS (SELECT DISTINCT g FROM e WHERE b >= 90)
       |SELECT e.doc_id AS id, count(*) AS n_spans, count(bench.g) AS dirty_spans,
       |       count(bench.g) > 0 AS contaminated
       |FROM e LEFT JOIN bench ON e.g = bench.g
       |WHERE e.b < 80
       |GROUP BY 1""".stripMargin

  /** Fuzzy (near-duplicate) decontamination — the MinHash leg of the
    * decon trio beside the exact 8-gram [[profile]] (qt15) and the
    * embedding-space SemanticDecon (qs16): a train document is
    * contaminated when it is a near-duplicate (estimated Jaccard >=
    * `threshold` over the portable MinHash) of ANY eval document —
    * catching lightly-paraphrased or whitespace/punctuation-perturbed
    * benchmark leaks that exact n-gram matching misses.
    *
    * Scale shape: identical to incremental dedup (qd19) — the eval set
    * is small by assumption, so its banded signatures BROADCAST into
    * one scan of the corpus's band stream (ids + band keys only; text
    * never shuffles); matches collapse to a per-train-doc count before
    * the only shuffle in the plan (keyed by doc id). */
  def fuzzyProfile(
      train: DataFrame, eval: DataFrame, text: Column, id: Column,
      threshold: Double): DataFrame = {
    val pairs = graft.operators.dedup.PortableMinHash
      .incrementalPairs(train, eval, text, id, threshold)
    train.select(id.as("doc_id"))
      .join(
        pairs.groupBy(col("doc_old").as("doc_id"))
          .agg(count(lit(1)).as("n_eval_matches")),
        Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_eval_matches"), lit(0L)).as("n_eval_matches"))
      .withColumn("contaminated", col("n_eval_matches") > 0)
  }

  /** Just the contaminated ids under the fuzzy criterion — the
    * drop-side seed for [[fuzzyProfile]]'s semantics, skipping the
    * full-frame densify (the `curate --bench-fuzzy` stage). */
  def fuzzyContaminatedIds(
      train: DataFrame, eval: DataFrame, text: Column, id: Column,
      threshold: Double): DataFrame =
    graft.operators.dedup.PortableMinHash
      .incrementalPairs(train, eval, text, id, threshold)
      .select(col("doc_old").as("doc_id"))
      .distinct()

  /** DuckDB formulation of qd34: eval = 'test' bucket (>= 90), corpus
    * = 'train' bucket (< 80), candidates joined ACROSS the split over
    * the shared portable-MinHash band CTEs, per-train-doc match count
    * densified over the full train frame. */
  def oracleFuzzySql(threshold: Double): String = {
    val mh = graft.operators.dedup.PortableMinHash
    val bucket =
      "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
    s"""${mh.pipelineCtes()},
       |sp AS (SELECT doc_id, $bucket AS b FROM documents),
       |candx AS (SELECT DISTINCT t.doc_id AS doc_old, e.doc_id AS doc_new
       |          FROM bands t JOIN bands e ON t.j = e.j AND t.bk = e.bk
       |          JOIN sp st ON st.doc_id = t.doc_id
       |          JOIN sp se ON se.doc_id = e.doc_id
       |          WHERE st.b < 80 AND se.b >= 90),
       |estx AS (SELECT doc_old, doc_new FROM candx
       |         JOIN sig sa ON candx.doc_old = sa.doc_id
       |         JOIN sig sb ON candx.doc_new = sb.doc_id
       |         WHERE CAST(length(list_filter(range(1, ${mh.numHashes + 1}),
       |                 i -> sa.sig[i] = sb.sig[i])) AS DOUBLE) / ${mh.numHashes}.0
       |               >= $threshold),
       |m AS (SELECT doc_old AS doc_id, count(*)::BIGINT AS n_eval_matches
       |      FROM estx GROUP BY doc_old)
       |SELECT s.doc_id, COALESCE(m.n_eval_matches, 0)::BIGINT AS n_eval_matches,
       |       COALESCE(m.n_eval_matches, 0) > 0 AS contaminated
       |FROM sp s LEFT JOIN m ON m.doc_id = s.doc_id
       |WHERE s.b < 80""".stripMargin
  }

  /** The BENCHMARK-side report — qt15 inverted: per eval document, how
    * many of its spans are burned (occur in ≥1 corpus document) and
    * how many corpus documents touch it. qt15 says which TRAIN docs to
    * drop; this says which EVAL items no longer measure anything and
    * must be re-drawn — the eval-integrity half of decontamination.
    *
    * Scale shape: the benchmark span set is still the broadcast side;
    * the corpus span stream hits it in one broadcast join and ONLY the
    * matches (tiny: true leaks) reach the per-eval-doc rollup, so the
    * corpus never shuffles and the aggregated side is leak-sized, not
    * corpus-sized. */
  def benchmarkReport(
      corpus: DataFrame,
      bench: DataFrame,
      text: Column,
      id: Column,
      n: Int = 8): DataFrame = {
    val bSpans = bench
      .select(id.as("id"), explode(SpanDedup.spanKeys(text, n)).as("g"))
    val hits = graft.operators.Parallelism.ensureMin(corpus)
      .select(id.as("tid"), explode(SpanDedup.spanKeys(text, n)).as("g"))
      .join(broadcast(bSpans), Seq("g"))
    val agg = hits.groupBy("id").agg(
      countDistinct("g").as("burned_spans"),
      countDistinct("tid").as("corpus_docs"))
    bench
      .select(id.as("id"), size(SpanDedup.spanKeys(text, n)).cast("bigint").as("n_spans"))
      .join(agg, Seq("id"), "left")
      .select(col("id"),
        col("n_spans"),
        coalesce(col("burned_spans"), lit(0L)).as("burned_spans"),
        coalesce(col("corpus_docs"), lit(0L)).as("corpus_docs"))
      .withColumn("burned", col("burned_spans") > 0)
  }

  /** DuckDB formulation of qt44: eval = 'test' bucket, corpus =
    * 'train' bucket (qt15's split), per-eval-doc burned-span and
    * touching-corpus-doc counts over the same md5 span keys. */
  def benchmarkReportOracleSql(n: Int = 8): String =
    s"""WITH nrm AS (SELECT doc_id,
       |               regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt,
       |               CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS b
       |             FROM documents),
       |tk AS (SELECT doc_id, b, string_split(nt, ' ') AS toks FROM nrm),
       |gs AS (SELECT doc_id, b,
       |              list_distinct(list_transform(
       |                range(1, greatest(len(toks) - ${n - 1}, 1) + 1),
       |                i -> md5(list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ')))) AS g
       |       FROM tk),
       |e AS (SELECT doc_id, b, unnest(g) AS g FROM gs),
       |hits AS (SELECT be.doc_id AS id, be.g, te.doc_id AS tid
       |         FROM e be JOIN e te ON be.g = te.g
       |         WHERE be.b >= 90 AND te.b < 80),
       |agg AS (SELECT id, count(DISTINCT g)::BIGINT AS burned_spans,
       |               count(DISTINCT tid)::BIGINT AS corpus_docs
       |        FROM hits GROUP BY id)
       |SELECT gs.doc_id AS id, CAST(len(gs.g) AS BIGINT) AS n_spans,
       |       COALESCE(agg.burned_spans, 0) AS burned_spans,
       |       COALESCE(agg.corpus_docs, 0) AS corpus_docs,
       |       COALESCE(agg.burned_spans, 0) > 0 AS burned
       |FROM gs LEFT JOIN agg ON agg.id = gs.doc_id
       |WHERE gs.b >= 90""".stripMargin

  /** Oracle for qp06 (transitive decontamination): the qt15 seed set
    * (train docs sharing an 8-gram with the test bucket) expanded
    * `maxHops` links over the portable-MinHash near-dup graph of the
    * train bucket. Frontier rounds are mechanically-chained CTE stages
    * (f_i = unreached neighbours of f_{i-1}), mirroring
    * [[graft.operators.GraphExpand]] round for round, so hop labels
    * are min-hop in both engines by the same argument. */
  def oracleTransitiveSql(threshold: Double, maxHops: Int, n: Int = 8): String = {
    require(maxHops >= 1, s"bad maxHops $maxHops")
    val bucket =
      "CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100"
    val trainFrom = s"(SELECT doc_id, text FROM documents WHERE $bucket < 80) tr"
    val mh = graft.operators.dedup.PortableMinHash.pipelineCtes(trainFrom)
    val hops = (1 to maxHops).map { i =>
      s"""f_$i AS (SELECT DISTINCT s.dst AS id
         |         FROM f_${i - 1} JOIN sym s ON f_${i - 1}.id = s.src
         |         WHERE s.dst NOT IN (SELECT id FROM r_${i - 1})),
         |r_$i AS (SELECT * FROM r_${i - 1}
         |         UNION ALL SELECT id, $i AS hop FROM f_$i)""".stripMargin
    }
    s"""$mh,
       |cn AS (SELECT doc_id,
       |         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS nt,
       |         $bucket AS b
       |       FROM documents),
       |ct AS (SELECT doc_id, b, string_split(nt, ' ') AS toks FROM cn),
       |cg AS (SELECT doc_id, b,
       |         list_distinct(list_transform(
       |           range(1, greatest(len(toks) - ${n - 1}, 1) + 1),
       |           i -> md5(list_aggregate(toks[i:i+${n - 1}], 'string_agg', ' ')))) AS g
       |       FROM ct),
       |ce AS (SELECT doc_id, b, unnest(g) AS g FROM cg),
       |cbench AS (SELECT DISTINCT g FROM ce WHERE b >= 90),
       |seeds AS (SELECT DISTINCT ce.doc_id AS id
       |          FROM ce JOIN cbench USING (g) WHERE ce.b < 80),
       |edges AS (SELECT doc_a, doc_b FROM est WHERE est_jaccard >= $threshold),
       |sym AS (SELECT doc_a AS src, doc_b AS dst FROM edges
       |        UNION SELECT doc_b AS src, doc_a AS dst FROM edges),
       |f_0 AS (SELECT id FROM seeds),
       |r_0 AS (SELECT id, 0 AS hop FROM seeds),
       |${hops.mkString(",\n")}
       |SELECT id, hop FROM r_$maxHops""".stripMargin
  }
}
