package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Barrier

/** Semantic deduplication — cluster-then-prune over an embedding
  * column: k-means partitions the corpus into semantically coherent
  * cells, exact cosine runs only WITHIN cells, and of each near-dup
  * pair the higher id is pruned. The cluster step is what makes
  * "compare every pair of 100 TB of embeddings" tractable: candidate
  * generation is the map-only [[KMeansCluster.assign]] pass, and the
  * quadratic stage shrinks from O(n²) to O(Σ n_c²) — with k sized so
  * cells hold thousands of vectors (k ≈ n/5000), that is ~n·5000, a
  * linear-in-n pair budget. The same shape as MinHash banding, with
  * learned geometry instead of hash buckets.
  *
  * Skew note: a pathological cell (the "junk cluster" every web corpus
  * has) is the hot-bucket problem again. Run EXACT dedup first — a
  * junk cell is near-identical by construction, so the exact pass
  * collapses it (the same argument as MinHashLSH.maxBucket); raising k
  * shrinks every cell's pair budget linearly.
  *
  * Every step is engine-deterministic ([[KMeansCluster]]'s lattice
  * Lloyd's + the bit-identical cosine fold), so the WHOLE
  * cluster→pair→prune composite carries a DuckDB value oracle (qs11).
  */
object SemanticDedup {

  /** Within-cluster near-dup pairs (vec_a < vec_b, cosine >= threshold)
    * under a fit + assign of [[KMeansCluster]]. The assigned table
    * crosses a [[Barrier]]: both join sides read it, and without one
    * the lineage would re-run the assignment scan per side. */
  def pairs(
      emb: DataFrame,
      vec: Column,
      id: Column,
      k: Int,
      iters: Int,
      threshold: Double): DataFrame = {
    val cents = KMeansCluster.fit(emb, vec, id, k, iters)
    val assigned = Barrier(
      KMeansCluster.assign(emb, vec, id, cents)
        .select(col("cluster"), col("id"), col("v")))
    val a = assigned.select(col("cluster"), col("id").as("vec_a"), col("v").as("e_a"))
    val b = assigned.select(col("cluster"), col("id").as("vec_b"), col("v").as("e_b"))
    a.join(b, Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cosine", VectorOps.cosine(col("e_a"), col("e_b")))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
      .dropDuplicates("vec_a", "vec_b")
  }

  /** Survivors: rows whose id never appears as the larger side of a
    * within-cluster near-dup pair (keep-lowest-id, the deterministic
    * form of SemDeDup's keep-one policy). */
  def prune(
      emb: DataFrame,
      vec: Column,
      id: Column,
      idCol: String,
      k: Int,
      iters: Int,
      threshold: Double): DataFrame = {
    val losers = pairs(emb, vec, id, k, iters, threshold)
      .select(col("vec_b").as(idCol))
      .distinct()
    emb.join(losers, Seq(idCol), "left_anti")
  }

  private def dotSql(a: String, b: String, dim: Int): String =
    s"list_reduce(list_transform(range(1, ${dim + 1}), i -> $a[i]::DOUBLE * $b[i]::DOUBLE), (x, y) -> x + y)"

  private def cosineSql(a: String, b: String, dim: Int): String = {
    val d = s"sqrt(${dotSql(a, a, dim)}) * sqrt(${dotSql(b, b, dim)})"
    s"CASE WHEN $d = 0 THEN 0.0 ELSE ${dotSql(a, b, dim)} / ($d) END"
  }

  /** DuckDB rendition of [[prune]] over `embeddings`: the k-means
    * assignment CTEs spliced ahead of the within-cluster pair prune. */
  def oracleSql(k: Int, threshold: Double, dim: Int = 64): String =
    s"""WITH ${KMeansCluster.oracleCtes(k, dim)},
       |losers AS (
       |  SELECT DISTINCT b.vec_id AS vec_id
       |  FROM kma a JOIN kma b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
       |  JOIN embeddings ea ON ea.vec_id = a.vec_id
       |  JOIN embeddings eb ON eb.vec_id = b.vec_id
       |  WHERE ${cosineSql("ea.embedding", "eb.embedding", dim)} >= $threshold)
       |SELECT vec_id, label FROM embeddings
       |WHERE vec_id NOT IN (SELECT vec_id FROM losers)""".stripMargin
}
