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
  * are dense clumps with tiny diameter (2-4 rounds), so label
  * propagation is the cheap default. A graph that exceeds `maxIter`
  * rounds (long paths) automatically escapes to
  * [[componentsByContraction]] — big-star/small-star contraction,
  * which halves distances per round and converges in O(log^2 n) on
  * any topology — rather than failing or returning a half-propagated
  * labeling.
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
    if (!converged) {
      // graph diameter exceeds the dedup-clump assumption (min-label
      // propagation needs diameter rounds); switch to star contraction,
      // which halves path lengths per round — O(log^2 n) total
      labels.unpersist(false)
      return componentsByContraction(edges, edgeA, edgeB, nodes, nodeId)
    }
    labels.select(col("node").as(nodeId), col("label").as("component"))
  }

  /** Connected components by alternating big-star/small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond", SoCC'14): each round rewires strictly-larger
    * neighbors (large-star) then smaller neighbors (small-star) onto
    * the local minimum, so path lengths HALVE per round — O(log^2 n)
    * rounds on any topology, where label propagation needs
    * diameter-many. The fixed point is a forest of stars: every edge
    * is (node, component-min).
    *
    * Scale shape per round: two groupBy-min aggregations (algebraic —
    * map-side partial, hub-key-safe) and two equi-joins on the node
    * key (AQE skew-split handles hub nodes; a Window formulation
    * could not split its hot partition). Convergence test is one
    * count+hash-sum aggregate per round, never a collect of edges. */
  def componentsByContraction(
      edges: DataFrame,
      edgeA: String,
      edgeB: String,
      nodes: DataFrame,
      nodeId: String,
      maxRounds: Int = 50)(implicit spark: SparkSession): DataFrame = {
    var e = edges
      .select(col(edgeA).as("a"), col(edgeB).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .transform(Barrier.apply)
    var prevSig = edgeSig(e)
    var converged = false
    var it = 0
    while (!converged && it < maxRounds) {
      val next = smallStar(largeStar(e)).transform(Barrier.apply)
      val sig = edgeSig(next)
      converged = sig == prevSig
      e.unpersist(false)
      e = next
      prevSig = sig
      it += 1
    }
    require(converged,
      s"star contraction did not converge in $maxRounds rounds — " +
        "O(log^2 n) is exceeded only by a degenerate input; check for " +
        "non-deterministic edge ids")
    // fixed point: every remaining edge is (node, component-min);
    // roots and singletons label themselves
    val labeled = e.select(col("a").as("node"), col("b").as("label"))
    nodes
      .select(col(nodeId).as("node"))
      .join(labeled, Seq("node"), "left")
      .select(
        col("node").as(nodeId),
        coalesce(col("label"), col("node")).as("component"))
  }

  /** Large-star: every neighbor v of u with v > u is rewired onto
    * min(Γ(u) ∪ u). Strictly-larger-only keeps the step acyclic. */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
    val mins = sym.groupBy("a").agg(min("b").as("mb"))
      .select(col("a"), least(col("mb"), col("a")).as("m"))
    sym
      .join(mins, "a")
      .filter(col("b") > col("a"))
      .select(col("b").as("a"), col("m").as("b"))
      .distinct()
  }

  /** Small-star: orient edges (larger -> smaller); each node's smaller
    * neighbors (and itself) rewire onto their minimum. */
  private def smallStar(edges: DataFrame): DataFrame = {
    val oriented = edges
      .select(
        greatest(col("a"), col("b")).as("a"),
        least(col("a"), col("b")).as("b"))
      .filter(col("a") =!= col("b"))
    val mins = oriented.groupBy("a").agg(min("b").as("m"))
    val joined = oriented.join(mins, "a")
    joined
      .filter(col("b") =!= col("m"))
      .select(col("b").as("a"), col("m").as("b"))
      .unionByName(joined.select(col("a"), col("m").as("b")))
      .distinct()
  }

  /** Order-independent edge-set signature: (count, sum of 64-bit row
    * hashes). Equal signatures across a round = the contraction
    * reached its fixed point; one aggregate, no edge collect. The sum
    * accumulates as DECIMAL(38,0) — a long sum of 64-bit hashes
    * overflows, and ANSI mode (the Spark 4 default) faults on it. */
  private def edgeSig(edges: DataFrame): (Long, String) = {
    val r = edges
      .agg(
        count(lit(1)).as("n"),
        sum(xxhash64(col("a"), col("b")).cast("decimal(38,0)")).as("h"))
      .head()
    (r.getLong(0), Option(r.getDecimal(1)).map(_.toPlainString).getOrElse("0"))
  }
}
