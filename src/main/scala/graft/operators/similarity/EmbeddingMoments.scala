package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-space second moments and the anisotropy monitor built on
  * them — the cheap continuous check that an embedding column hasn't
  * COLLAPSED (contextual embeddings are notoriously anisotropic: a
  * few directions hog the variance — Ethayarajh 2019; Mu & Viswanath
  * 2018 "all-but-the-top"). A corpus whose top-eigenvalue share
  * creeps toward 1 stops being searchable: every ANN/semantic-dedup
  * operator in this family degrades, so this is the monitor that
  * fires BEFORE qs11/qs16-style reactions are wasted effort.
  *
  * Scale shape: ONE scan, one aggregation — each row explodes to its
  * d(d+1)/2 upper-triangle products + d first moments + a count
  * sentinel, all BIGINT, and map-side partial aggregation collapses
  * every task to ≤ (d²/2 + d + 1) rows before the only shuffle.
  * Nothing downstream exceeds d² rows, so the eigen step is a
  * driver-side O(d²)-memory power iteration on a 64×64 matrix —
  * bounded work, documented, never corpus-sized.
  *
  * Portability: components floor-scale to integer MICRO units, so
  * every emitted moment is an order-free BIGINT sum (|v| ≤ 5·10⁵ →
  * products ≤ 2.5·10¹¹; 10⁶ rows stay < 2.5·10¹⁷ « 2⁶³) — the whole
  * moment table value-oracles.
  */
object EmbeddingMoments {

  /** Raw moment rows over micro-scaled components: (−1, −1, n);
    * (i, −1, Σ eᵢ) first moments; (i, j, Σ eᵢeⱼ) for i ≤ j. */
  def moments(df: DataFrame, emb: Column, dim: Int): DataFrame = {
    require(dim >= 2, s"bad dim $dim")
    val scaled = graft.operators.Parallelism.ensureMin(df)
      .select(transform(emb, x =>
        floor(x.cast("double") * lit(1000000.0)).cast("long")).as("e"))
    val idx = sequence(lit(0), lit(dim - 1))
    val countRow = array(struct(
      lit(-1L).as("i"), lit(-1L).as("j"), lit(1L).as("p")))
    val firsts = transform(idx, i => struct(
      i.cast("long").as("i"), lit(-1L).as("j"),
      element_at(col("e"), i + 1).as("p")))
    val pairs = flatten(transform(idx, i =>
      transform(sequence(i, lit(dim - 1)), j => struct(
        i.cast("long").as("i"), j.cast("long").as("j"),
        (element_at(col("e"), i + 1) * element_at(col("e"), j + 1))
          .as("p")))))
    scaled
      .select(explode(concat(countRow, firsts, pairs)).as("r"))
      .groupBy(col("r.i").as("i"), col("r.j").as("j"))
      .agg(sum("r.p").as("s"))
  }

  /** Driver-side eigen summary from the d²-bounded moment table:
    * (trace, topEigenvalue, topShare, meanNormSq) in micro² units —
    * topShare → 1 means collapse, → 1/d means isotropy. Power
    * iteration from the uniform start vector; covariance is PSD so
    * it converges to the dominant eigenpair. */
  def anisotropy(
      df: DataFrame, emb: Column, dim: Int,
      iters: Int = 100): AnisotropySummary =
    spectrum(df, emb, dim, k = 1, iters)._1

  /** ONE moment scan serving both the anisotropy summary and the
    * top-k directions — the shape qs35 composes from so the gate
    * costs one covariance pass, not three (review finding). */
  def spectrum(
      df: DataFrame, emb: Column, dim: Int, k: Int,
      iters: Int = 100): (AnisotropySummary, Array[Double], Array[Array[Double]]) = {
    require(k >= 1 && k < dim, s"bad k $k")
    val (n, m1, cov) = covFromMoments(df, emb, dim)
    val trace = (0 until dim).map(i => cov(i)(i)).sum
    val vs = Array.ofDim[Double](k, dim)
    var topEig = 0.0
    (0 until k).foreach { kk =>
      val (v, eig) = powerIterate(cov, vs.take(kk), kk, iters)
      vs(kk) = v
      if (kk == 0) topEig = eig
    }
    val meanNormSq = (0 until dim).map(i => (m1(i) / n) * (m1(i) / n)).sum
    (AnisotropySummary(n, trace, topEig,
      if (trace > 0) topEig / trace else 0.0, meanNormSq),
      m1.map(_ / n / 1e6), vs)
  }

  /** Decode the (i, j, s) moment rows into (n, raw first-moment sums,
    * covariance) — the ONE corpus scan every driver-side consumer
    * shares. */
  private def covFromMoments(
      df: DataFrame, emb: Column, dim: Int): (Long, Array[Double], Array[Array[Double]]) = {
    val rows = moments(df, emb, dim).collect()
    var n = 0L
    val m1 = Array.fill(dim)(0.0)
    val s2 = Array.ofDim[Double](dim, dim)
    rows.foreach { r =>
      val (i, j, s) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2))
      if (i == -1) n = s
      else if (j == -1) m1(i) = s.toDouble
      else { s2(i)(j) = s.toDouble; s2(j)(i) = s.toDouble }
    }
    require(n > 0, "empty embedding table")
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      s2(i)(j) / n - (m1(i) / n) * (m1(j) / n)
    }
    (n, m1, cov)
  }

  /** Dominant eigenpair of `cov` restricted to the orthogonal
    * complement of `prior` (deflation inside every step), from a
    * deterministic ±-pattern start varying with `seed`. */
  private def powerIterate(
      cov: Array[Array[Double]], prior: Seq[Array[Double]], seed: Int,
      iters: Int): (Array[Double], Double) = {
    val dim = cov.length
    var v = Array.tabulate(dim)(i =>
      if (i % (seed + 1) == 0) 1.0 / math.sqrt(dim.toDouble)
      else -1.0 / math.sqrt(dim.toDouble))
    var eig = 0.0
    (0 until iters).foreach { _ =>
      val w0 = Array.tabulate(dim)(i =>
        (0 until dim).map(j => cov(i)(j) * v(j)).sum)
      val w = prior.foldLeft(w0) { (acc, p) =>
        val d = (0 until dim).map(i => acc(i) * p(i)).sum
        Array.tabulate(dim)(i => acc(i) - d * p(i))
      }
      val norm = math.sqrt(w.map(x => x * x).sum)
      if (norm > 0) { v = w.map(_ / norm); eig = norm }
    }
    (v, eig)
  }

  final case class AnisotropySummary(
      n: Long, trace: Double, topEigenvalue: Double, topShare: Double,
      meanNormSq: Double)

  /** Mean + top-k principal directions from the d²-bounded moment
    * table — power iteration with deflation, driver-side O(k·d²).
    * Mean is in RAW units (micro /10⁶, so it applies directly to the
    * float embeddings); directions are unit vectors (scale-free). */
  def topDirections(
      df: DataFrame, emb: Column, dim: Int, k: Int,
      iters: Int = 100): (Array[Double], Array[Array[Double]]) = {
    val (_, mu, vs) = spectrum(df, emb, dim, k, iters)
    (mu, vs)
  }

  /** All-but-the-top (Mu & Viswanath 2018): x′ = (x − μ) −
    * Σ_k v_k (v_k · (x − μ)) — the post-processing that restores
    * retrieval contrast on anisotropic embedding clouds. The k
    * directions broadcast as literals; the transform is per-row
    * zip_with/aggregate work, zero shuffles. Returns (id, emb′)
    * with double components. */
  def removeTop(
      df: DataFrame, emb: Column, id: Column, dim: Int,
      k: Int = 1): DataFrame = {
    val (mu, vs) = topDirections(df, emb, dim, k)
    removeTopWith(df, emb, id, mu, vs)
  }

  /** [[removeTop]] reusing an already-computed (mean, directions)
    * pair — no extra corpus scan (qs35 composes this with
    * [[spectrum]]). */
  def removeTopWith(
      df: DataFrame, emb: Column, id: Column,
      mu: Array[Double], vs: Array[Array[Double]]): DataFrame = {
    val muLit = array(mu.map(lit(_)): _*)
    var out = df.select(id.as("id"),
      zip_with(emb, muLit, (a, b) => a.cast("double") - b).as("e"))
    vs.foreach { v =>
      val vLit = array(v.map(lit(_)): _*)
      out = out
        .withColumn("d",
          aggregate(zip_with(col("e"), vLit, (a, b) => a * b),
            lit(0.0), (acc, x) => acc + x))
        .withColumn("e",
          zip_with(col("e"), vLit, (a, vi) => a - col("d") * vi))
        .drop("d")
    }
    out.select(col("id"), col("e").as("emb"))
  }

  /** qs34 oracle — literal SQL twin of [[moments]] over `embeddings`. */
  def oracleMomentsSql(dim: Int): String =
    s"""WITH dims AS (SELECT CAST(unnest(range(0, $dim)) AS BIGINT) AS i),
       |e AS (
       |  SELECT vec_id, dims.i,
       |         CAST(floor(CAST(embedding[CAST(dims.i AS INT) + 1] AS DOUBLE)
       |                    * 1000000.0) AS BIGINT) AS v
       |  FROM embeddings, dims)
       |SELECT CAST(-1 AS BIGINT) AS i, CAST(-1 AS BIGINT) AS j,
       |       count(*)::BIGINT AS s
       |FROM embeddings
       |UNION ALL
       |SELECT i, CAST(-1 AS BIGINT), CAST(sum(v) AS BIGINT) FROM e GROUP BY i
       |UNION ALL
       |SELECT a.i, b.i, CAST(sum(a.v * b.v) AS BIGINT)
       |FROM e a JOIN e b ON a.vec_id = b.vec_id AND b.i >= a.i
       |GROUP BY a.i, b.i""".stripMargin
}
