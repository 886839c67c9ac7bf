package graft.operators.dedup

import graft.operators.Barrier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — turns a
  * near-duplicate PAIR set into duplicate CLUSTERS (each doc labeled
  * with the smallest reachable id), the step between pair mining
  * (MinHashLSH / PortableMinHash) and choosing one canonical document
  * per group. dedupKeepFirst's greedy pass drops pair losers without
  * ever materializing groups; components make group structure explicit
  * (cluster sizes, canonical representative, audit).
  *
  * Algorithm: labels start as own id; each round every node takes the
  * min of its label and its neighbors' labels (one equi-join on the
  * symmetrized edge list + one min-aggregation); stop when a round
  * changes nothing. Rounds needed = graph diameter — near-dup graphs
  * are dense clumps with tiny diameter (2-4 rounds). A long-path graph
  * would need the big-star/small-star contraction (halves distances per
  * round) — not warranted for dedup clusters; `maxIter` guards the
  * pathological case and fails loudly rather than returning a
  * half-propagated labeling.
  *
  * Scale shape per round: the join shuffles (edge endpoint, label)
  * pairs — O(|E|) rows of two longs, never documents; the label table
  * is checkpointed eagerly each round (same lineage-cut rationale as
  * the sketch tables: without it round k replays rounds 1..k-1).
  * Driver work is one boolean convergence count per round.
  */
object ConnectedComponents {

  /** @param edges undirected pair set, two long-compatible columns
    * @param nodes one row per node id (singletons keep their own label)
    * @return (id, component) with component = min reachable id */
  def components(
      edges: DataFrame,
      edgeA: String,
      edgeB: String,
      nodes: DataFrame,
      nodeId: String,
      maxIter: Int = 20)(implicit spark: SparkSession): DataFrame = {
    val sym = edges
      .select(col(edgeA).as("a"), col(edgeB).as("b"))
      .unionByName(edges.select(col(edgeB).as("a"), col(edgeA).as("b")))
      .transform(Barrier.apply)

    var labels = nodes
      .select(col(nodeId).as("node"), col(nodeId).as("label"))
      .transform(Barrier.apply)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val viaNeighbor = sym
        .join(labels, sym("b") === labels("node"))
        .select(sym("a").as("node"), col("label"))
      val next = labels
        .unionByName(viaNeighbor)
        .groupBy("node")
        .agg(min("label").as("label"))
        .transform(Barrier.apply)
      converged = next
        .join(labels.withColumnRenamed("label", "prev"), "node")
        .where(col("label") =!= col("prev"))
        .isEmpty
      // `next` is already materialized (eager checkpoint) and the
      // convergence check consumed the old labels — release the stale
      // round's blocks now instead of leaking one cached copy per round
      labels.unpersist(false)
      labels = next
      it += 1
    }
    sym.unpersist(false)
    require(converged,
      s"components did not converge in $maxIter rounds — graph diameter " +
        "exceeds the dedup-clump assumption; raise maxIter or use " +
        "star-contraction")
    labels.select(col("node").as(nodeId), col("label").as("component"))
  }
}
