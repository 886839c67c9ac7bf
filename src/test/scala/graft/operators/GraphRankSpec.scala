package graft.operators

import graft.SparkSpec

class GraphRankSpec extends SparkSpec {
  import spark.implicits._

  private def run(
      nodes: Seq[String], edges: Seq[(String, String)], rounds: Int): Map[String, Long] =
    GraphRank.rank(
        nodes.toDF("n"), "n", edges.toDF("s", "d"), "s", "d", rounds)
      .as[(String, Long)].collect().toMap

  test("two-node symmetric cycle is a fixed point") {
    val got = run(Seq("a", "b"), Seq(("a", "b"), ("b", "a")), 4)
    assert(got == Map("a" -> 1000000L, "b" -> 1000000L))
  }

  test("directed chain drains into the sink, mass conserved exactly") {
    // a -> b, b sinkless: r1 a=150000 b=1850000; r2 a keeps
    // 150000-127500=22500, b (outdeg 0) keeps all + 127500
    val got = run(Seq("a", "b"), Seq(("a", "b")), 2)
    assert(got == Map("a" -> 22500L, "b" -> 1977500L))
    assert(got.values.sum == 2000000L)
  }

  test("star center accumulates authority; totals conserved") {
    val leaves = (1 to 6).map(i => s"l$i")
    val edges = leaves.flatMap(l => Seq((l, "hub"), ("hub", l)))
    val got = run("hub" +: leaves, edges, 5)
    assert(got.values.sum == 7L * 1000000L)
    assert(got("hub") > got("l1"))
    // symmetric leaves end identical
    assert(leaves.map(got).distinct.size == 1)
  }

  test("isolated nodes keep their initial mass") {
    val got = run(Seq("a", "b", "zzz"), Seq(("a", "b"), ("b", "a")), 3)
    assert(got("zzz") == 1000000L)
  }

  test("duplicate edge rows do not double-send") {
    val once = run(Seq("a", "b"), Seq(("a", "b")), 1)
    val dup = run(Seq("a", "b"), Seq(("a", "b"), ("a", "b")), 1)
    assert(once == dup)
  }
}
