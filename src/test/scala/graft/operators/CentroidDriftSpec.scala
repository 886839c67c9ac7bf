package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.similarity.CentroidDrift

class CentroidDriftSpec extends SparkSpec {
  import spark.implicits._

  test("a shifted group shows distance; balanced mirror groups agree") {
    // group a at +1 on dim 0, group b at -1: global centroid is the
    // origin, both groups sit exactly 1.0 away
    val rows = (1 to 10).map(i =>
      ("a", Seq(1.0f, 0.0f, 0.0f))) ++ (1 to 10).map(i =>
      ("b", Seq(-1.0f, 0.0f, 0.0f)))
    val got = CentroidDrift.profile(
        rows.toDF("label", "embedding"), col("embedding"), col("label"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(got("a")._2 == 10L && got("b")._2 == 10L)
    assert(got("a")._3 == 1.0, got("a").toString)
    assert(got("b")._3 == 1.0)
  }

  test("a group at the global centroid reports ~zero drift") {
    val rows =
      (1 to 8).map(_ => ("center", Seq(0.5f, -0.25f))) ++
        (1 to 4).map(_ => ("hi", Seq(1.0f, -0.5f))) ++
        (1 to 4).map(_ => ("lo", Seq(0.0f, 0.0f)))
    val got = CentroidDrift.profile(
        rows.toDF("label", "embedding"), col("embedding"), col("label"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    // center sits exactly at the global mean; hi/lo are symmetric
    assert(got("center") < 1e-5, got.toString)
    assert(math.abs(got("hi") - got("lo")) < 1e-5)
    assert(got("hi") > 0.3)
  }

  test("matches a driver-side micro-integer re-derivation") {
    val rows = Seq(
      ("x", Seq(0.123f, -0.456f)), ("x", Seq(0.789f, 0.111f)),
      ("y", Seq(-0.5f, 0.25f)), ("y", Seq(0.333f, -0.999f)),
      ("y", Seq(0.001f, 0.002f)))
    def micro(f: Float): Long = math.floor(f.toDouble * 1e6).toLong
    val byG = rows.groupBy(_._1)
    val dims = 2
    val gSums = (0 until dims).map(j =>
      rows.map(r => micro(r._2(j))).sum)
    val gN = rows.size.toLong
    val expect = byG.map { case (g, rs) =>
      val d2 = (0 until dims).map { j =>
        val c = rs.map(r => micro(r._2(j))).sum / rs.size
        val gc = gSums(j) / gN
        val d = c - gc; d * d
      }.sum
      g -> math.floor(math.sqrt(d2.toDouble) / 1e6 * 1e6) / 1e6
    }
    val got = CentroidDrift.profile(
        rows.toDF("label", "embedding"), col("embedding"), col("label"))
      .as[(String, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    expect.foreach { case (g, d) => assert(got(g) == d, s"group $g") }
  }
}
