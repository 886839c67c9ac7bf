package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.similarity.EmbeddingMoments

class EmbeddingMomentsSpec extends SparkSpec {
  import spark.implicits._

  private def micro(x: Double): Long = math.floor(x * 1e6).toLong

  test("moments match a driver-side re-derivation") {
    val vecs = Seq(
      Array(0.25f, -0.5f, 0.125f),
      Array(-0.3f, 0.1f, 0.45f),
      Array(0.0f, 0.2f, -0.15f))
    val got = vecs.map(v => Tuple1(v)).toDF("embedding")
      .select(col("embedding"))
      .transform(df => EmbeddingMoments.moments(df, col("embedding"), 3))
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val e = vecs.map(_.map(x => micro(x.toDouble)))
    assert(got((-1L, -1L)) == 3L)
    (0 until 3).foreach { i =>
      assert(got((i.toLong, -1L)) == e.map(_(i)).sum, s"m1 $i")
      (i until 3).foreach { j =>
        assert(got((i.toLong, j.toLong)) == e.map(v => v(i) * v(j)).sum,
          s"s2 $i $j")
      }
    }
    assert(got.size == 1 + 3 + 6)
  }

  test("anisotropy recovers the closed-form top eigenpair in 2-d") {
    // 2×2 covariance has a closed-form spectrum; re-derive it from
    // the same floored micro values the operator uses (floor is
    // asymmetric on negatives: -0.001f → -1001)
    val vecs = Seq(
      Array(0.001f, 0.0f), Array(-0.001f, 0.0f),
      Array(0.0f, 0.002f), Array(0.0f, -0.002f))
    val a = EmbeddingMoments.anisotropy(
      vecs.map(v => Tuple1(v)).toDF("embedding"), col("embedding"), 2)
    assert(a.n == 4L)
    val e = vecs.map(v => v.map(x => micro(x.toDouble).toDouble))
    val n = e.size.toDouble
    def cov(i: Int, j: Int): Double =
      e.map(v => v(i) * v(j)).sum / n -
        (e.map(_(i)).sum / n) * (e.map(_(j)).sum / n)
    val (cxx, cxy, cyy) = (cov(0, 0), cov(0, 1), cov(1, 1))
    val top = (cxx + cyy) / 2.0 +
      math.sqrt(math.pow((cxx - cyy) / 2.0, 2) + cxy * cxy)
    assert(math.abs(a.trace - (cxx + cyy)) / (cxx + cyy) < 1e-9)
    assert(math.abs(a.topEigenvalue - top) / top < 1e-9)
    assert(math.abs(a.topShare - top / (cxx + cyy)) < 1e-9)
  }

  test("a collapsed (rank-1) cloud has top share ~ 1") {
    val dir = Array.tabulate(8)(i => (i + 1).toFloat / 100f)
    val vecs = (1 to 40).map(k =>
      Tuple1(dir.map(x => x * (k % 5 - 2).toFloat)))
    val a = EmbeddingMoments.anisotropy(
      vecs.toDF("embedding"), col("embedding"), 8)
    assert(a.topShare > 0.999, s"share ${a.topShare}")
  }

  test("an axis-uniform cloud is near-isotropic") {
    // one vector per axis direction, ± — all eigenvalues equal
    val vecs = (0 until 8).flatMap { i =>
      Seq(1.0f, -1.0f).map { s =>
        Tuple1(Array.tabulate(8)(j => if (j == i) 0.01f * s else 0.0f))
      }
    }
    val a = EmbeddingMoments.anisotropy(
      vecs.toDF("embedding"), col("embedding"), 8)
    assert(a.topShare < 0.13 + 1e-9, s"share ${a.topShare}") // 1/8 ideal
  }

  test("the fixture embeddings are neither collapsed nor degenerate") {
    val a = EmbeddingMoments.anisotropy(
      spark.read.parquet(s"$sf0001/embeddings.parquet"),
      col("embedding"), 64)
    assert(a.n == 500L)
    assert(a.trace > 0.0)
    assert(a.topShare > 1.0 / 64.0 && a.topShare < 0.9, s"${a.topShare}")
  }
}
