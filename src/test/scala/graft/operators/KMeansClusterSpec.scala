package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.similarity.KMeansCluster

class KMeansClusterSpec extends SparkSpec {
  import spark.implicits._

  // two tight blobs on opposite corners of a 4-d cube plus one outlier
  private def vf(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
  private lazy val vecs = Seq(
    (0L, vf(0.0, 0.0, 0.1, 0.0)),
    (1L, vf(0.1, 0.0, 0.0, 0.0)),
    (2L, vf(0.0, 0.1, 0.0, 0.1)),
    (3L, vf(1.0, 1.0, 0.9, 1.0)),
    (4L, vf(0.9, 1.0, 1.0, 1.0)),
    (5L, vf(1.0, 0.9, 1.0, 0.9))
  ).toDF("vec_id", "embedding")

  test("fit + assign separates the two blobs whatever the init draw") {
    val cents = KMeansCluster.fit(vecs, col("embedding"), col("vec_id"), k = 2, iters = 3)
    val a = KMeansCluster.assign(vecs, col("embedding"), col("vec_id"), cents)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(Set(a(0L), a(1L), a(2L)).size == 1, "low blob splits")
    assert(Set(a(3L), a(4L), a(5L)).size == 1, "high blob splits")
    assert(a(0L) != a(3L), "blobs merged")
  }

  test("fit is layout-invariant: same centroids at any partitioning") {
    val c1 = KMeansCluster.fit(vecs.repartition(1), col("embedding"), col("vec_id"), 2, 2)
    val c7 = KMeansCluster.fit(vecs.repartition(7), col("embedding"), col("vec_id"), 2, 2)
    assert(c1 == c7, "centroid determinism broke under re-partitioning")
  }

  test("assignment is map-only: centroids ride as literals, no join, no shuffle") {
    val cents = KMeansCluster.initCentroids(vecs, col("embedding"), col("vec_id"), 2)
    val plan = KMeansCluster.assign(vecs, col("embedding"), col("vec_id"), cents)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"assign must not shuffle:\n$plan")
    assert(!plan.contains("Join"), s"assign must not join:\n$plan")
  }

  test("argmin tie-break picks the lowest cluster id") {
    // a probe equidistant from two identical centroids
    val cents = Seq(
      KMeansCluster.Centroid(1, Seq(0.5, 0.5, 0.5, 0.5)),
      KMeansCluster.Centroid(2, Seq(0.5, 0.5, 0.5, 0.5)))
    val a = KMeansCluster.assign(vecs, col("embedding"), col("vec_id"), cents)
      .select("cluster").as[Int].collect()
    assert(a.forall(_ == 1))
  }

  test("empty clusters drop out of the update") {
    // k=3 over 6 points collapsing into 2 blobs can strand a centroid;
    // force it with a far-away synthetic centroid nothing selects
    val cents = Seq(
      KMeansCluster.Centroid(1, Seq(0.0, 0.0, 0.0, 0.0)),
      KMeansCluster.Centroid(2, Seq(1.0, 1.0, 1.0, 1.0)),
      KMeansCluster.Centroid(3, Seq(99.0, 99.0, 99.0, 99.0)))
    val updated = KMeansCluster.update(
      KMeansCluster.assign(vecs, col("embedding"), col("vec_id"), cents))
    assert(updated.map(_.cluster) == Seq(1, 2))
    assert(updated.forall(_.vec.length == 4))
  }

  test("lattice means are exact: a cluster of identical vectors keeps its vector") {
    val same = Seq(
      (0L, vf(0.25, -0.5, 0.75, 0.125)),
      (1L, vf(0.25, -0.5, 0.75, 0.125))).toDF("vec_id", "embedding")
    val cents = KMeansCluster.fit(same, col("embedding"), col("vec_id"), k = 1, iters = 1)
    // all components are exactly representable on the 2^20 lattice
    assert(cents.head.vec == Seq(0.25, -0.5, 0.75, 0.125))
  }
}
