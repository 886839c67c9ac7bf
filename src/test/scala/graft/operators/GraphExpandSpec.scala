package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class GraphExpandSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      seeds: Seq[Long], edges: Seq[(Long, Long)], maxHops: Int): Map[Long, Int] =
    GraphExpand.expand(
        seeds.toDF("id"), "id", edges.toDF("a", "b"), "a", "b", maxHops)
      .as[(Long, Int)].collect().toMap

  test("chain expands hop by hop and stops at maxHops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(run(Seq(1L), edges, 2) == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  test("hop labels are MIN distance on a diamond") {
    // 1-2, 1-3, 2-4, 3-4: node 4 reachable two ways, both hop 2
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
    assert(run(Seq(1L), edges, 5) ==
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("edges are undirected and seeds merge frontiers") {
    val edges = Seq((10L, 20L), (30L, 20L))
    assert(run(Seq(20L), edges, 1) == Map(20L -> 0, 10L -> 1, 30L -> 1))
    // two seeds, shared neighbour keeps the smaller hop (0 as a seed)
    assert(run(Seq(10L, 20L), edges, 2) ==
      Map(10L -> 0, 20L -> 0, 30L -> 1))
  }

  test("early exit on a drained frontier; isolated seeds survive") {
    val edges = Seq((1L, 2L))
    // node 99 touches no edge; expansion past the component is a no-op
    assert(run(Seq(99L), edges, 3) == Map(99L -> 0))
    assert(run(Seq(1L), edges, 100) == Map(1L -> 0, 2L -> 1))
  }

  test("empty seed set yields an empty result") {
    assert(run(Seq.empty, Seq((1L, 2L)), 2).isEmpty)
    intercept[IllegalArgumentException] {
      run(Seq(1L), Seq((1L, 2L)), 0)
    }
  }
}
