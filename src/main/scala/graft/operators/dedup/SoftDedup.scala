package graft.operators.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Soft deduplication — keep every document but DOWNWEIGHT duplicates:
  * each doc's sampling weight is 1 / (size of its near-dup cluster), so
  * a cluster of k near-copies contributes one document's worth of
  * probability mass to training instead of k (the soft alternative to
  * qp04's hard canonical-select, used when near-dups still carry
  * marginal signal — cf. the sampling-weight treatment of duplication
  * in data-mixture work such as DoReMi/DSIR-adjacent pipelines, where
  * removal is too blunt).
  *
  * Output per doc: (doc_id, component, cluster_size, weight_milli,
  * effective_chars_milli) — weight and effective length as order-free
  * INTEGER milli units, so sums of them downstream stay engine-exact.
  *
  * Exactness of the milli floors: both engines compute
  * floor(a / b) over IEEE doubles with integer-valued a = n·1000 <
  * 2^53 and b = cluster_size. When b ∤ a the true quotient is at least
  * 1/b away from any integer while the division's rounding error is
  * under (a/b)·2⁻⁵² < 1/b (since a < 2^52), so the floor can never be
  * misrounded — at ANY corpus scale, not just the fixture's.
  *
  * 100 TB shape: the expensive part is the near-dup pair mining +
  * connected components, both already bounded (banded LSH candidates,
  * O(log² n) contraction rounds, ids-only shuffles — see [[MinHashLSH]]
  * / [[ConnectedComponents]]); the weighting itself adds ONE
  * component-keyed count aggregate (algebraic, map-side partial) and
  * one join back — AQE skew-splits a pathological mega-cluster's join,
  * where a window-count formulation could not split its hot partition.
  */
object SoftDedup {

  /** Per-document soft-dedup weights over the portable-MinHash near-dup
    * graph at `threshold` (the qd16 component convention: component =
    * least reachable id; singletons weigh 1000 milli). */
  def weights(
      docs: DataFrame, text: Column, id: Column, nChars: Column,
      threshold: Double)(implicit spark: SparkSession): DataFrame = {
    val edges = PortableMinHash.pairs(docs, text, id, threshold)
    val comp = ConnectedComponents.components(
      edges, "doc_a", "doc_b", docs.select(id.as("doc_id")), "doc_id")
    val sizes = comp.groupBy("component")
      .agg(count(lit(1)).as("cluster_size"))
    comp
      .join(docs.select(id.as("doc_id"), nChars.as("n_chars")), Seq("doc_id"))
      .join(sizes, Seq("component"))
      .select(
        col("doc_id"), col("component"), col("cluster_size"),
        floor(lit(1000.0) / col("cluster_size").cast("double"))
          .cast("long").as("weight_milli"),
        floor((col("n_chars") * lit(1000L)).cast("double") /
            col("cluster_size").cast("double"))
          .cast("long").as("effective_chars_milli"))
  }
}
