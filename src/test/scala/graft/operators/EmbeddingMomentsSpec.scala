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

  test("removeTop zeroes the removed direction, the mean, and its variance") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val before = EmbeddingMoments.anisotropy(emb, col("embedding"), 64)
    val (_, vs) = EmbeddingMoments.topDirections(emb, col("embedding"), 64, 1)
    val t = EmbeddingMoments.removeTop(
      emb, col("embedding"), col("vec_id"), 64, k = 1)
    assert(t.count() == emb.count())
    // residual projection onto the removed direction is numerically 0
    val vLit = array(vs(0).map(lit(_)): _*)
    val maxResid = t.select(abs(aggregate(
        zip_with(col("emb"), vLit, (a, b) => a * b),
        lit(0.0), (acc, x) => acc + x)).as("p"))
      .agg(max("p")).head().getDouble(0)
    assert(maxResid < 1e-6, s"residual $maxResid")
    val after = EmbeddingMoments.anisotropy(t, col("emb"), 64)
    info(s"before: trace=${before.trace} eig=${before.topEigenvalue} " +
      s"share=${before.topShare} meanSq=${before.meanNormSq}")
    info(s"after:  trace=${after.trace} eig=${after.topEigenvalue} " +
      s"share=${after.topShare} meanSq=${after.meanNormSq}")
    // the removed direction's variance leaves the trace entirely
    assert(after.trace < before.trace - 0.9 * before.topEigenvalue,
      s"trace ${before.trace} -> ${after.trace} (eig ${before.topEigenvalue})")
    assert(after.topEigenvalue < before.topEigenvalue,
      "the new top eigenvalue must be the old second one")
    // mean removal: micro-floor bias keeps |mean| <= 1 micro per dim
    assert(after.meanNormSq < 100.0, s"meanSq ${after.meanNormSq}")
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
