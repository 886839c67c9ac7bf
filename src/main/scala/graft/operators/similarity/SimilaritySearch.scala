package graft.operators.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column. Three tiers, in increasing scale-readiness:
  *
  *   1. [[bruteForceTopK]] — exact cosine against every vector; one scan,
  *      no shuffle of vectors (top-k via TakeOrdered). The baseline and
  *      the verifier for the approximate tiers.
  *   2. [[annTopK]] — random-hyperplane LSH: only corpus vectors that
  *      share a bucket with the probe (in any of `numTables` tables)
  *      are scored. Candidate set shrinks ~2^nbits-fold per table.
  *   3. [[IvfIndex]] — inverted-file index: k-means coarse centroids
  *      (trained on a sample), vectors partitioned by nearest centroid;
  *      a query probes the `nprobe` nearest cells. This is the layout
  *      that works at 100 TB: the cell assignment is a narrow column,
  *      cells are read selectively (partition pruning when the index is
  *      written partitioned-by-cell), and centroids broadcast.
  */
object SimilaritySearch {

  /** Exact top-k by cosine against one probe vector. Ties broken by id
    * for determinism. */
  def bruteForceTopK(
      df: DataFrame,
      vec: Column,
      id: Column,
      probe: Seq[Float],
      k: Int): DataFrame = {
    val q = typedLit(probe)
    df.select(id.as("id"), VectorOps.cosine(vec, q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** LSH-restricted top-k: exact cosine, but only over bucket-sharing
    * candidates. Recall grows with numTables; cost shrinks with nbits. */
  def annTopK(
      df: DataFrame,
      vec: Column,
      id: Column,
      probe: Seq[Float],
      k: Int,
      dim: Int,
      nbits: Int = 6,
      numTables: Int = 4): DataFrame = {
    val q = typedLit(probe)
    val tables = (0 until numTables).map(t =>
      VectorOps.hyperplaneBucket(col("v"), dim, nbits, seed = 42L + t)
        === VectorOps.hyperplaneBucket(q, dim, nbits, seed = 42L + t))
    df.select(id.as("id"), vec.as("v"))
      .filter(tables.reduce(_ || _))
      .select(col("id"), VectorOps.cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Top-k per probe for a whole DataFrame of probes: broadcast the
    * (small) probe set, score each corpus vector against each probe,
    * keep k per probe via window. Probe count must be modest — this is
    * the "join a query batch against the corpus" shape. */
  def topKJoin(
      corpus: DataFrame,
      corpusVec: Column,
      corpusId: Column,
      probes: DataFrame,
      probeVec: Column,
      probeId: Column,
      k: Int): DataFrame = {
    val c = corpus.select(corpusId.as("corpus_id"), corpusVec.as("cv"))
    val p = probes.select(probeId.as("probe_id"), probeVec.as("pv"))
    val w = Window.partitionBy("probe_id").orderBy(col("cosine").desc, col("corpus_id"))
    c.crossJoin(broadcast(p))
      .select(
        col("probe_id"),
        col("corpus_id"),
        VectorOps.cosine(col("cv"), col("pv")).as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }
}

/** IVF coarse index. Build once (k-means on a sample — driver-side fit
  * over collected sample vectors, standard Lloyd iterations, no MLlib
  * Vector boxing on the hot path), then assignments are a pure column
  * expression: argmin over the broadcast centroid literals.
  */
final class IvfIndex private (
    val centroids: Array[Array[Double]],
    dim: Int) extends Serializable {

  private def centroidCols: Seq[Column] =
    centroids.indices.map(i => typedLit(centroids(i).toSeq))

  /** Cell id (nearest centroid by cosine) for a vector column —
    * usable for partitioning/bucketing the stored index. */
  def cell(vec: Column): Column = {
    // argmax of cosine over centroids via a struct-max trick:
    // greatest((sim, idx)...) picks the best (sim, then idx) pair.
    val scored = centroids.indices.map { i =>
      struct(VectorOps.cosine(vec, centroidCols(i)).as("sim"), lit(i).as("idx"))
    }
    greatest(scored: _*).getField("idx")
  }

  /** Write the corpus as an on-disk IVF index: parquet partitioned by
    * cell id, so probe-time reads prune at the FILE level — the layout
    * that makes ANN work at 100 TB (a probe touches nprobe/numCells of
    * the data; everything else is never opened). */
  def writeIndex(
      df: DataFrame,
      vec: Column,
      id: Column,
      dir: String): Unit =
    df.select(id.as("id"), vec.as("v"))
      .withColumn("cell", cell(col("v")))
      .write
      .mode("overwrite")
      .partitionBy("cell")
      .parquet(dir)

  /** Top-k over a written index: the cell filter is a partition filter,
    * so only the probed cells' files are scanned. */
  def topKIndexed(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      probe: Seq[Float],
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val probeD = probe.map(_.toDouble).toArray
    val best = centroids.indices
      .sortBy(i => -IvfIndex.cosine(probeD, centroids(i)))
      .take(nprobe)
    val q = typedLit(probe)
    spark.read.parquet(dir)
      .filter(col("cell").isin(best: _*))
      .select(col("id"), VectorOps.cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }

  /** Exact cosine top-k restricted to the `nprobe` cells nearest the
    * probe vector. */
  def topK(
      df: DataFrame,
      vec: Column,
      id: Column,
      probe: Seq[Float],
      k: Int,
      nprobe: Int = 2): DataFrame = {
    val probeD = probe.map(_.toDouble).toArray
    val best = centroids.indices
      .sortBy(i => -IvfIndex.cosine(probeD, centroids(i)))
      .take(nprobe)
      .toSet
    val q = typedLit(probe)
    df.select(id.as("id"), vec.as("v"))
      .filter(cell(col("v")).isin(best.toSeq: _*))
      .select(col("id"), VectorOps.cosine(col("v"), q).as("cosine"))
      .orderBy(col("cosine").desc, col("id"))
      .limit(k)
  }
}

object IvfIndex {

  private[similarity] def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d == 0) 0.0 else dot / d
  }

  /** Train on (a sample of) the corpus: k-means with fixed iteration
    * count — deterministic AND cross-engine portable (round 13: the
    * former xxhash64 sample + seeded-shuffle init were the last two
    * non-SQL-reproducible steps in the whole IVF path; with both on
    * md5 rank, [[IvfOracle]] re-derives the ENTIRE fit — Lloyd
    * iterations included — and qs04 graduated off the rows-only list).
    * Sample collect is bounded by `sampleSize`; at 100 TB you train on
    * a few hundred thousand rows, never the full corpus.
    *
    * The sample is the `sampleSize` rows smallest under
    * `md5('ivf_sample_' || id)` — a deterministic uniform draw (the
    * hash acts as the PRNG) that is invariant under partition
    * count/ordering, unlike `limit()` which takes the physically-first
    * rows and would train centroids on one shard's distribution when a
    * 100 TB corpus is laid out by source or time. `orderBy + limit`
    * plans as TakeOrderedAndProject (per-partition top-k, no full sort
    * shuffle). The id column must be UNIQUE: the sample key is derived
    * from the id alone, so duplicate ids share a key and the boundary
    * draw between them would be partition-order-dependent — the same
    * contract every id column in this library carries, and the one
    * [[IvfOracle]]'s row_number replay assumes (round-13 review). Init is deterministic farthest-point (k-center greedy:
    * start at the rank-1 sample row, then repeatedly add the sample
    * vector whose max-cosine to the chosen set is smallest, ties to the
    * lower rank) — spread seeds beat the seeded shuffle's arbitrary
    * draw on recall (measured: qs08's 3-of-8-cell probe misses 2/6/3
    * of the exact top-10 across the three fixture scales vs 5/8/6 for
    * a first-k draw) and stay exactly SQL-expressible. Lloyd
    * accumulation runs in rank order so the float sums are
    * reproducible ordered folds. */
  def fit(
      df: DataFrame,
      vec: Column,
      id: Column,
      numCells: Int,
      sampleSize: Int = 10000,
      iterations: Int = 10): IvfIndex = {
    import org.apache.spark.sql.Row
    val sample = df
      .select(
        md5(concat(lit("ivf_sample_"), id.cast("string"))).as("__r"),
        vec.cast("array<double>").as("v"))
      .orderBy(col("__r"))
      .limit(sampleSize)
      .select("v")
      .collect()
      .map { case Row(v: scala.collection.Seq[_]) =>
        v.map(_.asInstanceOf[Double]).toArray
      }
    require(sample.nonEmpty, "cannot fit IVF on an empty corpus")
    val dim = sample.head.length
    var centers = Array(sample(0).clone)
    while (centers.length < math.min(numCells, sample.length)) {
      var bi = 0; var bd = Double.MaxValue; var i = 0
      while (i < sample.length) {
        var mx = Double.MinValue; var c = 0
        while (c < centers.length) {
          val s = cosine(sample(i), centers(c)); if (s > mx) mx = s; c += 1
        }
        if (mx < bd) { bd = mx; bi = i }
        i += 1
      }
      centers = centers :+ sample(bi).clone
    }
    (0 until iterations).foreach { _ =>
      val sums = Array.fill(centers.length)(new Array[Double](dim))
      val counts = new Array[Long](centers.length)
      sample.foreach { v =>
        var best = 0; var bestSim = Double.MinValue; var i = 0
        while (i < centers.length) {
          val s = cosine(v, centers(i)); if (s > bestSim) { bestSim = s; best = i }; i += 1
        }
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
        counts(best) += 1
      }
      centers = centers.indices.map { i =>
        if (counts(i) == 0) centers(i)
        else sums(i).map(_ / counts(i))
      }.toArray
    }
    new IvfIndex(centers, dim)
  }
}
