package graft.operators.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval — reciprocal-rank fusion (RRF) of a lexical
  * ranking ([[Bm25]]) and a dense ranking (brute cosine against a
  * probe embedding), the standard production search pattern: BM25
  * catches exact-term matches embeddings blur, embeddings catch
  * paraphrases BM25 cannot see, and RRF fuses on RANKS so the two
  * incomparable score scales never need calibration:
  *
  *   rrf(d) = Σ_lists 1 / (K + rank_list(d)),  K = 60 (the constant
  *   from the original RRF paper's grid search).
  *
  * Engine-exactness: contributions are carried as the INTEGER
  * 10^6 div (K + rank) — ranks are deterministic (score desc, id
  * tiebreak), integer division is exact in both engines, and the
  * fused sum of ≤ 2 small integers per doc never touches a float.
  *
  * Scale shape: each list is top-`kPerList` (serving-sized); the rank
  * windows and the fusion join run over ≤ 2·kPerList rows regardless
  * of corpus size — all the heavy lifting happens inside the two
  * rankers, which keep their own documented shapes (BM25: hit rows
  * shuffle, stats broadcast, TakeOrdered; cosine: native kernel +
  * TakeOrdered).
  */
object HybridRetrieval {

  val K = 60

  /** Top-`kOut` fused results: (id, lex_rank, dense_rank, rrf_scaled)
    * — ranks null when a doc appears in only one list. `probeId` is
    * the embedding row used as the dense query; the dense list ranks
    * only documents (embedding ids joined to doc ids). */
  def topK(
      docs: DataFrame,
      text: Column,
      id: Column,
      emb: DataFrame,
      queryTerms: Seq[String],
      probeId: Long,
      kPerList: Int,
      kOut: Int): DataFrame = {
    import docs.sparkSession.implicits._
    val lex = Bm25.topK(docs, text, id, queryTerms, kPerList)
    // the probe vector is one bounded driver value (the qs02 pattern)
    val probe = emb.filter(col("vec_id") === probeId)
      .select(col("embedding")).as[Seq[Float]].head()
    val docEmb = emb
      .join(docs.select(id.as("vec_id")), Seq("vec_id"))
      .filter(col("vec_id") =!= probeId)
    val dense = graft.operators.similarity.SimilaritySearch
      .bruteForceTopK(docEmb, col("embedding"), col("vec_id"), probe, kPerList)
    fuse(lex, dense, col("cosine"), kOut)
  }

  /** TEXT-ONLY hybrid: the same RRF fusion with the dense leg served
    * by [[HashedEmbedding.queryTopK]] instead of a pre-built
    * embeddings table — free-text hybrid search over a corpus that
    * has nothing but text. The query string feeds BOTH legs: its
    * tokens to BM25, its hashed embedding to the cosine ranker. */
  def textTopK(
      docs: DataFrame,
      text: Column,
      id: Column,
      query: String,
      kPerList: Int = 50,
      kOut: Int = 15,
      dim: Int = 64): DataFrame = {
    val terms = query.toLowerCase.trim.replaceAll("\\s+", " ")
      .split(" ").toSeq.filter(_.nonEmpty)
    require(terms.nonEmpty, "empty query")
    val lex = Bm25.topK(docs, text, id, terms, kPerList)
    val dense = HashedEmbedding.queryTopK(docs, text, id, query, dim, kPerList)
    fuse(lex, dense, col("cos"), kOut)
  }

  /** ONE fusion implementation for every hybrid entry point: rank
    * both lists (windows over kPerList rows — single-task is the
    * point), full-outer on id, integer RRF, (score DESC, id) cut. */
  private def fuse(
      lex: DataFrame,
      dense: DataFrame,
      denseScore: Column,
      kOut: Int): DataFrame = {
    val lexRanked = lex.withColumn(
      "lex_rank",
      row_number().over(Window.orderBy(col("score").desc, col("id"))).cast("long"))
      .select(col("id"), col("lex_rank"))
    val denseRanked = dense.withColumn(
      "dense_rank",
      row_number().over(Window.orderBy(denseScore.desc, col("id"))).cast("long"))
      .select(col("id"), col("dense_rank"))
    lexRanked
      .join(denseRanked, Seq("id"), "full_outer")
      .withColumn(
        "rrf_scaled",
        coalesce(expr(s"1000000L div (${K}L + lex_rank)"), lit(0L)) +
          coalesce(expr(s"1000000L div (${K}L + dense_rank)"), lit(0L)))
      .orderBy(col("rrf_scaled").desc, col("id"))
      .limit(kOut)
      .select("id", "lex_rank", "dense_rank", "rrf_scaled")
  }

  private def dotSql(a: String, b: String): String =
    s"list_reduce(list_transform(range(1, 65), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String): String = {
    val d = s"sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE ${dotSql(a, b)} / ($d) END"
  }

  def oracleSql(
      queryTerms: Seq[String],
      probeId: Long,
      kPerList: Int,
      kOut: Int): String =
    s"""WITH lex AS (
       |  SELECT id, row_number() OVER (ORDER BY score DESC, id) AS lex_rank
       |  FROM (${Bm25.oracleSql(queryTerms, kPerList)}) z),
       |p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = $probeId),
       |de AS (SELECT e.vec_id, e.embedding
       |       FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
       |       WHERE e.vec_id <> $probeId),
       |scored AS (SELECT vec_id, ${cosineSql("de.embedding", "p.pe")} AS c
       |           FROM de, p),
       |dtop AS (SELECT vec_id AS id, c FROM scored
       |         ORDER BY c DESC, vec_id LIMIT $kPerList),
       |dense AS (SELECT id, row_number() OVER (ORDER BY c DESC, id) AS dense_rank
       |          FROM dtop),
       |fused AS (
       |  SELECT COALESCE(lex.id, dense.id) AS id, lex.lex_rank, dense.dense_rank,
       |         COALESCE(1000000 // ($K + lex.lex_rank), 0)
       |           + COALESCE(1000000 // ($K + dense.dense_rank), 0) AS rrf_scaled
       |  FROM lex FULL OUTER JOIN dense ON lex.id = dense.id)
       |SELECT id, lex_rank, dense_rank, rrf_scaled
       |FROM fused ORDER BY rrf_scaled DESC, id LIMIT $kOut""".stripMargin
}
