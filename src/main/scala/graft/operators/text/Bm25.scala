package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** BM25 ranked retrieval — the lexical search primitive a curation
  * stack needs beside embedding ANN ([[graft.operators.similarity.SimilaritySearch]]):
  * retrieval-based dedup probes, targeted corpus audits ("every doc
  * matching this incident query"), and hard-negative mining all start
  * with a BM25 top-k. Okapi scoring with the +1 idf smoothing (always
  * positive, the Lucene convention): for query term t and doc d,
  * idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5)) and
  * tf-part = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).
  *
  * Scale shape: the query is a LITERAL term set, so the token explode
  * filters to query terms at the scan (predicate pushes into the
  * generator's consumer — rows leaving the map stage are one per
  * (doc, query-term) HIT, not per token). One narrow (id, term)
  * aggregation for tf, a query-sized df aggregate and a 1-row corpus
  * stat, both broadcast back; the final top-k is TakeOrdered (no
  * global sort). Nothing shuffles but hit rows.
  *
  * Portable scoring: per-(doc, term) contributions are a fixed IEEE
  * operation chain mirrored token for token in [[oracleSql]], summed
  * by an ORDERED fold (term order) so addition order is
  * engine-independent; the ROUNDED score (4 dp, the qt14 convention)
  * ranks, with id tiebreak, so a last-ulp `ln` difference cannot
  * reorder rows.
  */
object Bm25 {

  /** Top-k (id, score) for `queryTerms` over the corpus. */
  def topK(
      df: DataFrame,
      text: Column,
      id: Column,
      queryTerms: Seq[String],
      k: Int = 15,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty && k >= 1, "empty query or bad k")
    val docs = graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), TextOps.tokens(text).as("toks"))
      .select(col("id"), col("toks"),
        size(col("toks")).cast("double").as("dl"))
    val stats = docs.agg(
      (sum("dl") / count(lit(1)).cast("double")).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    // both tf and dfq consume the hit stream whose lineage is the full
    // tokenize+explode corpus scan — barrier so it runs once (r19)
    val hits = graft.operators.Barrier(docs
      .select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*)))
    val tf = hits.groupBy("id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
    val dfq = hits.groupBy("term")
      .agg(countDistinct("id").cast("double").as("dft"))
    val contrib = tf
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("c",
        log(lit(1.0) + (col("n") - col("dft") + lit(0.5)) / (col("dft") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl")))))
    contrib
      .groupBy("id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0),
        (acc, x) => acc + x.getField("c")).as("raw"))
      .select(col("id"), graft.operators.PortableRound.floorTo(col("raw"), 4).as("score"))
      .orderBy(col("score").desc, col("id"))
      .limit(k)
  }

  /** Top-k per query for a BATCH of queries in ONE corpus pass — the
    * qs27/qe16 batch discipline applied to lexical retrieval: the
    * corpus tokenizes once, the union of all query terms joins the hit
    * stream as one broadcast (so rows leaving the map stage are still
    * per-(doc, hit)), per-term df and the corpus stats are computed
    * once and shared across queries, and the only per-query work is
    * the grouped ranking window (partitionBy query_id — never a global
    * sort). Scoring is the identical IEEE chain as [[topK]], so each
    * query's batch rows equal its solo rows value-for-value (pinned in
    * Bm25Spec). Returns (query_id, id, score, lex_rank ≤ k). */
  def topKBatch(
      df: DataFrame,
      text: Column,
      id: Column,
      queries: Seq[(Long, Seq[String])],
      k: Int = 15,
      k1: Double = 1.2,
      b: Double = 0.75): DataFrame =
    topKBatchTok(
      graft.operators.Parallelism.ensureMin(df)
        .select(id.as("id"), TextOps.tokens(text).as("toks"))
        .select(col("id"), col("toks"),
          size(col("toks")).cast("double").as("dl")),
      queries, k, k1, b)

  /** [[topKBatch]] over a PRE-TOKENIZED frame (id, toks, dl) — the
    * shared-scan entry (r20): HybridRetrieval tokenizes the corpus
    * once behind a barrier and feeds this leg and the hashed-embedding
    * leg from it, instead of each leg (and the corpus-stats aggregate
    * here) re-running the tokenize scan. Same expressions row for row,
    * so scores are bit-identical to [[topKBatch]]. */
  private[text] def topKBatchTok(
      docs: DataFrame,
      queries: Seq[(Long, Seq[String])],
      k: Int,
      k1: Double,
      b: Double): DataFrame = {
    require(queries.nonEmpty && queries.forall(_._2.nonEmpty) && k >= 1,
      "empty query batch or bad k")
    val ss = docs.sparkSession
    import ss.implicits._
    val qterms = queries
      .flatMap { case (qid, ts) => ts.distinct.map(qid -> _) }
      .toDF("query_id", "term")
    val stats = docs.agg(
      (sum("dl") / count(lit(1)).cast("double")).as("avgdl"),
      count(lit(1)).cast("double").as("n"))
    // the hit stream is tiny (query-term matches only) but its lineage
    // is the full tokenize+explode corpus scan, and BOTH dfq and tf
    // consume it — barrier so the scan runs once, not twice (r19)
    val hits = graft.operators.Barrier(docs
      .select(col("id"), col("dl"), explode(col("toks")).as("term"))
      .join(broadcast(qterms), Seq("term")))
    // df(term) is query-independent: distinct docs per term over the
    // hit stream (duplicate (qid, term) hits cannot inflate it)
    val dfq = hits.select("term", "id").distinct()
      .groupBy("term").agg(count(lit(1)).cast("double").as("dft"))
    val tf = hits.groupBy("query_id", "id", "term")
      .agg(count(lit(1)).cast("double").as("tf"), first("dl").as("dl"))
    val contrib = tf
      .join(broadcast(dfq), "term")
      .crossJoin(broadcast(stats))
      .withColumn("c",
        log(lit(1.0) + (col("n") - col("dft") + lit(0.5)) / (col("dft") + lit(0.5))) *
          (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * (col("dl") / col("avgdl")))))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("score").desc, col("id"))
    contrib
      .groupBy("query_id", "id")
      .agg(aggregate(
        array_sort(collect_list(struct(col("term"), col("c")))),
        lit(0.0),
        (acc, x) => acc + x.getField("c")).as("raw"))
      .select(col("query_id"), col("id"),
        graft.operators.PortableRound.floorTo(col("raw"), 4).as("score"))
      .withColumn("lex_rank", row_number().over(w).cast("long"))
      .filter(col("lex_rank") <= k)
  }

  /** DuckDB rendition: identical tokenization, identical IEEE operation
    * chain (constants interpolated via shortest-round-trip repr, so
    * both engines parse the same doubles), identical ordered fold and
    * rounding. */
  def oracleSql(
      queryTerms: Seq[String],
      k: Int = 15,
      k1: Double = 1.2,
      b: Double = 0.75): String = {
    val terms = queryTerms.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""WITH d AS (SELECT doc_id,
       |             string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |           FROM documents),
       |dd AS (SELECT doc_id, len(toks)::DOUBLE AS dl, toks FROM d),
       |st AS (SELECT sum(dl) / CAST(count(*) AS DOUBLE) AS avgdl,
       |              CAST(count(*) AS DOUBLE) AS n
       |       FROM dd),
       |hits AS (SELECT doc_id, dl, unnest(toks) AS term FROM dd),
       |h AS (SELECT * FROM hits WHERE term IN ($terms)),
       |tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf,
       |              first(dl) AS dl
       |       FROM h GROUP BY doc_id, term),
       |dfq AS (SELECT term, CAST(count(DISTINCT doc_id) AS DOUBLE) AS dft
       |        FROM h GROUP BY term),
       |c AS (SELECT tf.doc_id, tf.term,
       |        ln(1.0 + (st.n - dfq.dft + 0.5) / (dfq.dft + 0.5)) *
       |          (tf.tf * ${k1 + 1}) /
       |          (tf.tf + $k1 * (${1 - b} + $b * (tf.dl / st.avgdl))) AS c
       |      FROM tf JOIN dfq USING (term), st),
       |s AS (SELECT doc_id, (floor((list_reduce(list_prepend(0.0,
       |               list(c ORDER BY term)), (a, x) -> a + x)) * 10000.0) / 10000.0) AS score
       |      FROM c GROUP BY doc_id)
       |SELECT doc_id AS id, score FROM s
       |ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
  }
}
