package graft.operators.dedup

import graft.operators.Barrier
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Exact n-gram Jaccard similarity — the verification stage behind
  * MinHash's estimate. Pair generation must come from a bounded
  * candidate source (LSH buckets, or a partition-key like `source`);
  * an unconstrained cross join is quadratic and is deliberately not
  * offered.
  */
object NGramJaccard {

  /** |A ∩ B| / |A ∪ B| over two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(array_union(a, b))
    when(union === 0, lit(1.0)).otherwise(inter.cast("double") / union.cast("double"))
  }

  /** Pairs within a blocking key (e.g. `source`) scored by exact
    * token-n-gram Jaccard, id_a < id_b, similarity >= threshold. */
  def pairsWithinBlock(
      df: DataFrame,
      text: Column,
      id: Column,
      block: Column,
      n: Int = 3,
      threshold: Double = 0.2): DataFrame = {
    // materialized so gram arrays are built once per doc, not once per
    // pair through the join lineage; localCheckpoint so the blocks are
    // freed when the result is dropped (see MinHashLSH)
    val g = graft.operators.Parallelism.ensureMin(df).select(
      block.as("blk"),
      id.as("id"),
      TextOps.tokenShingles(text, n).as("grams"))
      .transform(Barrier.apply)
    val a = g.select(col("blk"), col("id").as("id_a"), col("grams").as("g_a"))
    val b = g.select(col("blk"), col("id").as("id_b"), col("grams").as("g_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("jaccard", jaccard(col("g_a"), col("g_b")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
