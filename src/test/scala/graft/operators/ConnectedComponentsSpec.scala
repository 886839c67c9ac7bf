package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup.ConnectedComponents

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private implicit val s: org.apache.spark.sql.SparkSession = spark

  test("labels chains, cliques, and singletons with the min reachable id") {
    // components: {1,2,3,4} (path), {10,11,12} (triangle), {20} (isolated)
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (11L, 12L), (10L, 12L))
      .toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L).toDF("id")
    val got = ConnectedComponents.components(edges, "a", "b", nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L))
  }

  test("a long path exceeding maxIter escapes to star contraction") {
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val nodes = (1 to n).map(_.toLong).toDF("id")
    // diameter 11 > maxIter 3: label propagation cannot converge —
    // the contraction fallback must still produce the full labeling
    val got = ConnectedComponents
      .components(edges, "a", "b", nodes, "id", maxIter = 3)
      .as[(Long, Long)].collect().toMap
    assert(got.values.toSet == Set(1L) && got.size == n)
    // and converges directly when allowed enough rounds
    val ok = ConnectedComponents.components(edges, "a", "b", nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(1L) && ok.size == n)
  }

  test("star contraction labels mixed topologies like label propagation") {
    // path + triangle + singleton + a star with a high-id center:
    // both algorithms must agree on every node
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), // path 1-2-3-4
      (10L, 11L), (11L, 12L), (10L, 12L), // triangle
      (100L, 50L), (100L, 51L), (100L, 52L) // star centered on 100
    ).toDF("a", "b")
    val nodes = (Seq(1L, 2L, 3L, 4L, 10L, 11L, 12L, 20L, 50L, 51L, 52L, 100L))
      .toDF("id")
    val prop = ConnectedComponents.components(edges, "a", "b", nodes, "id")
      .as[(Long, Long)].collect().toMap
    val star = ConnectedComponents
      .componentsByContraction(edges, "a", "b", nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(star == prop)
    assert(star(52L) == 50L && star(100L) == 50L, "star center mislabeled")
    assert(star(20L) == 20L, "singleton lost")
  }

  test("star contraction handles a 200-node path (diameter >> rounds)") {
    val n = 200
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val nodes = (1 to n).map(_.toLong).toDF("id")
    val got = ConnectedComponents
      .componentsByContraction(edges, "a", "b", nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(got.size == n && got.values.toSet == Set(1L))
  }
}
