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

  test("a long path exceeding maxIter fails loudly instead of mislabeling") {
    val n = 12
    val edges = (1 until n).map(i => (i.toLong, (i + 1).toLong)).toDF("a", "b")
    val nodes = (1 to n).map(_.toLong).toDF("id")
    // diameter 11 > maxIter 3: must throw, not return a partial labeling
    intercept[IllegalArgumentException] {
      ConnectedComponents.components(edges, "a", "b", nodes, "id", maxIter = 3)
    }
    // and converges when allowed enough rounds
    val ok = ConnectedComponents.components(edges, "a", "b", nodes, "id")
      .as[(Long, Long)].collect().toMap
    assert(ok.values.toSet == Set(1L) && ok.size == n)
  }
}
