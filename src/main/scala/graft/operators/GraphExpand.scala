package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-hop frontier expansion (breadth-first search) over an
  * undirected edge list — the graph primitive behind TRANSITIVE
  * policies: "anything within `maxHops` near-dup links of a flagged
  * document inherits the flag". Complements [[dedup.ConnectedComponents]]
  * (full closure, unbounded radius): expansion is seeded, hop-labeled
  * and radius-bounded, the shape policy rules actually want (a
  * contaminated doc's direct near-dups are almost-certain leaks; its
  * 5th-degree neighbourhood is noise).
  *
  * Scale shape: classic Pregel-style frontier iteration. Per hop, the
  * frontier (ids only) joins the symmetrized edge list on its source
  * key — ONE narrow hash-join shuffle per round, with the frontier as
  * the (typically small, AQE-broadcastable) build side — then
  * `left_anti` against the reached set keeps the frontier minimal, so
  * hop labels are min-hop by construction. Rounds are bounded by
  * `maxHops` (small by policy) and stop early on an empty frontier;
  * every round crosses a [[Barrier]] so lineage never replays prior
  * rounds. Nothing quadratic: work per round is O(frontier-degree
  * sum), the BFS optimum.
  *
  * (No reference analog — `cmd/root.go` copies rows; this is part of
  * the LLM-curation surface built on the same engine.)
  */
object GraphExpand {

  /** Expand `seeds` over undirected `edges` for up to `maxHops`
    * rounds; returns (id, hop) where hop is the MINIMUM link distance
    * from any seed (0 = the seed itself). Seeds absent from the graph
    * still appear (hop 0). */
  def expand(
      seeds: DataFrame,
      seedCol: String,
      edges: DataFrame,
      aCol: String,
      bCol: String,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"bad maxHops $maxHops")
    val sym = Barrier(
      edges.select(col(aCol).as("src"), col(bCol).as("dst"))
        .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
        .distinct())
    // `reached` is kept as the UNION of the per-hop frontier
    // checkpoints instead of a re-materialized copy per hop (r19): the
    // former `Barrier(reached ∪ next)` re-wrote the ENTIRE reached set
    // every hop — O(hops × |reached|) checkpoint churn — where the
    // union view reads each hop's (already materialized) frontier
    // exactly once per consumer. Every part is live until the result
    // is consumed, so total checkpoint footprint is |reached| — the
    // same as the old FINAL frame, without the per-hop copies the
    // round-18 ENOSPC postmortem was about. Nothing is released
    // mid-run because nothing is superseded mid-run.
    val seed = Barrier(
      seeds.select(seedCol).distinct()
        .select(col(seedCol).as("id"), lit(0).as("hop")))
    var reached = seed
    var frontier = seed.select("id")
    var h = 1
    var drained = false
    while (h <= maxHops && !drained) {
      // the barrier's materializing action counts the frontier (r20):
      // the drained test was a second per-hop job over the checkpoint
      val (next, nNext) = Barrier.counting(
        frontier.join(sym, frontier("id") === sym("src"))
          .select(col("dst").as("id")).distinct()
          .join(reached, Seq("id"), "left_anti"),
        None)
      if (nNext == 0L) {
        drained = true
        // the empty frontier's own (empty) checkpoint is dead on
        // arrival; the live `reached` is untouched
        Barrier.release(next)
      } else {
        val part = next.withColumn("hop", lit(h))
        reached = reached.union(part)
        frontier = next.select("id")
      }
      h += 1
    }
    Barrier.release(sym)
    reached
  }
}
