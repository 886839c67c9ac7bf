package graft.operators.dedup

import graft.operators.Barrier
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.similarity.VectorOps

/** Embedding-cosine near-duplicate detection: bucket vectors by a
  * random-hyperplane LSH signature, then confirm cosine within each
  * bucket. The bucket join is the only shuffle; with `nbits` bits the
  * expected bucket population is n / 2^nbits, which is how this stays
  * sub-quadratic at 100 TB — tune nbits so buckets hold O(100) vectors.
  * Recall can be raised by multiple probe tables (seed variants);
  * exposed as `numTables`.
  */
object EmbeddingDedup {

  def candidatePairs(
      df: DataFrame,
      vec: Column,
      id: Column,
      dim: Int,
      threshold: Double = 0.95,
      nbits: Int = 8,
      numTables: Int = 2): DataFrame = {
    val base = graft.operators.Parallelism.ensureMin(df)
      .select(id.as("id"), vec.as("v"))
    // materialized before the self-join so bucket signatures (nbits ×
    // numTables dot products per vector) are computed once per vector,
    // not once per candidate pair; localCheckpoint so the blocks are
    // freed when the result is dropped (see MinHashLSH)
    val tabled = base.select(
      col("id"),
      col("v"),
      posexplode(array((0 until numTables).map(t =>
        VectorOps.hyperplaneBucket(col("v"), dim, nbits, seed = 42L + t)): _*))
        .as(Seq("tab", "bucket")))
      .transform(Barrier.apply)
    // bucket self-join on ids only; vectors re-attached after pair
    // dedup so each embedding crosses the wire once per vector, not
    // once per probe-table replica (see MinHashLSH.candidatePairs)
    val a = tabled.select(col("tab"), col("bucket"), col("id").as("id_a"))
    val b = tabled.select(col("tab"), col("bucket"), col("id").as("id_b"))
    // multi-table collision duplicates survive until after the cosine
    // filter (identical values per pair) — one less full-width shuffle
    val pairs = a.join(b, Seq("tab", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
    // base already holds one (id, v) row per vector — no dedup shuffle
    val byVec = base
    pairs
      .join(byVec.select(col("id").as("id_a"), col("v").as("v_a")), "id_a")
      .join(byVec.select(col("id").as("id_b"), col("v").as("v_b")), "id_b")
      .withColumn("cosine", VectorOps.cosine(col("v_a"), col("v_b")))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
      .dropDuplicates("id_a", "id_b")
  }
}
