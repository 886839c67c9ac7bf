package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.similarity.{IvfIndex, SimilaritySearch}

/** Similarity-search inventory over `embeddings`. Rankings over float
  * cosine are not bit-stable across engines, so the search queries get
  * rows-only checks (value-level verification lives in SimilaritySpec,
  * which cross-checks ANN/IVF against the exact brute force); the
  * label-profile query is integer-exact and oracled.
  */
object SimilarityQueries {

  /** Deterministic probe: the corpus vector with vec_id = 0. */
  private def probe(s: org.apache.spark.sql.SparkSession, dir: String): Seq[Float] =
    Tables.load(s, dir, "embeddings")
      .filter(col("vec_id") === 0)
      .select("embedding")
      .head()
      .getSeq[Float](0)

  val all: Seq[Q] = Seq(
    Q(
      "qs01_label_profile",
      (s, dir) =>
        Tables.load(s, dir, "embeddings")
          .groupBy("label")
          .agg(
            count(lit(1)).as("n"),
            min("vec_id").as("min_id"),
            max("vec_id").as("max_id")),
      Some("""SELECT label, count(*) AS n, min(vec_id) AS min_id, max(vec_id) AS max_id
              FROM embeddings GROUP BY label""")),
    Q(
      "qs02_topk_bruteforce",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        SimilaritySearch
          .bruteForceTopK(emb, col("embedding"), col("vec_id"), probe(s, dir), 10)
          .select(col("id").as("vec_id"), round(col("cosine"), 4).as("cosine"))
      },
      None,
      bench = true),
    Q(
      "qs03_topk_ann",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        SimilaritySearch
          .annTopK(emb, col("embedding"), col("vec_id"), probe(s, dir), 10,
            dim = 64, nbits = 4, numTables = 4)
          .select(col("id").as("vec_id"), round(col("cosine"), 4).as("cosine"))
      },
      None),
    Q(
      "qs04_topk_ivf",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val index = IvfIndex.fit(emb, col("embedding"), numCells = 8)
        index
          .topK(emb, col("embedding"), col("vec_id"), probe(s, dir), 10, nprobe = 3)
          .select(col("id").as("vec_id"), round(col("cosine"), 4).as("cosine"))
      },
      None),
    Q(
      "qs05_topk_batch",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val probes = emb.filter(col("vec_id") < 5)
        SimilaritySearch
          .topKJoin(emb, col("embedding"), col("vec_id"),
            probes, col("embedding"), col("vec_id"), k = 5)
          .select(col("probe_id"), col("corpus_id"), col("rank"))
      },
      None)
  )
}
