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
  * has) is the hot-bucket problem again, and — like
  * [[graft.operators.dedup.MinHashLSH]]'s `maxBucket` — the cap is
  * ENFORCED IN CODE, not left to documentation: cells whose population
  * exceeds `maxCell` never enter the exact within-cell self-join.
  * Instead they are re-split by signed random-hyperplane LSH
  * ([[VectorOps.hyperplaneBucket]], the [[graft.operators.dedup.EmbeddingDedup]]
  * machinery) and pairs form only within (cell, table, bucket) — and
  * any bucket STILL over `maxCell` after both splits is dropped and
  * counted rather than exploded, exactly the MinHashLSH hot-bucket
  * argument: a group that survives k-means AND an LSH split at that
  * size is near-identical junk an exact-dedup pass collapses anyway.
  * Every joinable group is therefore <= maxCell rows in code, so the
  * pair budget is bounded by (#groups)·maxCell² — never quadratic in a
  * cell. Run exact dedup first regardless; raising k shrinks every
  * cell's pair budget linearly.
  *
  * Every step is engine-deterministic ([[KMeansCluster]]'s lattice
  * Lloyd's + the bit-identical cosine fold), so the WHOLE
  * cluster→pair→prune composite carries a DuckDB value oracle (qs11).
  */
object SemanticDedup {

  /** Within-cluster near-dup pairs (vec_a < vec_b, cosine >= threshold)
    * under a fit + assign of [[KMeansCluster]]. The assigned table
    * crosses a [[Barrier]]: both join sides read it, and without one
    * the lineage would re-run the assignment scan per side.
    *
    * `maxCell` is the enforced skew guard (see class doc): cells over
    * it take the hyperplane-LSH fallback path instead of the exact
    * self-join. `dim`/`fallbackBits`/`fallbackTables` parameterize that
    * fallback only — they never touch results when every cell fits
    * (the qs11 oracle regime). Both the over-cap cell list (<= k rows)
    * and the residual hot-bucket list (near-identical floods, tiny by
    * the MinHashLSH argument) ride broadcasts, so the guard costs one
    * cheap count aggregation, no extra wide shuffle. */
  def pairs(
      emb: DataFrame,
      vec: Column,
      id: Column,
      k: Int,
      iters: Int,
      threshold: Double,
      maxCell: Int = 100000,
      dim: Int = 64,
      fallbackBits: Int = 8,
      fallbackTables: Int = 2): DataFrame = {
    require(maxCell > 0, s"bad maxCell=$maxCell")
    val cents = KMeansCluster.fit(emb, vec, id, k, iters)
    val assigned = Barrier(
      KMeansCluster.assign(emb, vec, id, cents)
        .select(col("cluster"), col("id"), col("v")))
    // the over-cap cell list is at most k rows — broadcast it
    val big = assigned.groupBy("cluster").count()
      .filter(col("count") > maxCell)
      .select("cluster")
    // cold cells (the normal regime): exact within-cell pairs, ids only
    // through the join — vectors are re-attached once after the union,
    // so each embedding crosses the pair join's shuffle as a slim id
    val cold = assigned.join(broadcast(big), Seq("cluster"), "left_anti")
    val coldPairs = cold.select(col("cluster"), col("id").as("vec_a"))
      .join(cold.select(col("cluster"), col("id").as("vec_b")), Seq("cluster"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
    // hot cells: re-split by signed-hyperplane LSH; pairs only within
    // (cluster, tab, bucket); buckets still over maxCell are dropped
    val hot = assigned.join(broadcast(big), Seq("cluster"), "left_semi")
      .select(col("cluster"), col("id"),
        posexplode(array((0 until fallbackTables).map(t =>
          VectorOps.hyperplaneBucket(col("v"), dim, fallbackBits, seed = 1042L + t)): _*))
          .as(Seq("tab", "bucket")))
      .transform(Barrier.apply)
    val hotBig = hot.groupBy("cluster", "tab", "bucket").count()
      .filter(col("count") > maxCell)
      .select("cluster", "tab", "bucket")
    val hotCapped = hot.join(broadcast(hotBig), Seq("cluster", "tab", "bucket"), "left_anti")
    val hotPairs = hotCapped
      .select(col("cluster"), col("tab"), col("bucket"), col("id").as("vec_a"))
      .join(
        hotCapped.select(col("cluster"), col("tab"), col("bucket"), col("id").as("vec_b")),
        Seq("cluster", "tab", "bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b")
    // a pair lives entirely in ONE cell, and a cell is hot xor cold, so
    // the union never duplicates across branches; multi-table collision
    // duplicates within hot survive until the final dedup (identical
    // cosine per pair — see EmbeddingDedup)
    val byId = assigned.select(col("id"), col("v"))
    coldPairs.union(hotPairs)
      .join(byId.select(col("id").as("vec_a"), col("v").as("e_a")), "vec_a")
      .join(byId.select(col("id").as("vec_b"), col("v").as("e_b")), "vec_b")
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
      threshold: Double,
      maxCell: Int = 100000,
      dim: Int = 64): DataFrame = {
    val losers = pairs(emb, vec, id, k, iters, threshold, maxCell, dim)
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
