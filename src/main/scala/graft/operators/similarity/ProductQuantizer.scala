package graft.operators.similarity

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorExprs

/** Product quantization — the memory side of billion-scale ANN (the
  * canonical IVF companion): each 64-dim float vector (256 bytes)
  * compresses to ONE 32-bit code (8 subspaces × 4-bit codewords, a
  * 64× reduction), and queries scan codes via an asymmetric-distance
  * (ADC) lookup table of m·k precomputed sub-distances instead of
  * full-width dot products. At 100 TB this is the difference between
  * "the corpus codes fit in executor memory" and "they do not".
  * (No reference analog; part of the added LLM-pipeline surface.)
  *
  * Codebooks are md5-derived constants — the externally-supplied-
  * codebook mode every production PQ runs in (train offline, apply
  * online; [[PortableIvf]]'s argument), which makes encode, packing,
  * and the ADC scan reproducible in SQL: qs13/qs14 are fully
  * value-oracled. A data-fitted codebook is mechanical from here —
  * run [[KMeansCluster.fit]] per subspace slice and inject the
  * centroids — but keeps the same apply-side shapes below.
  *
  * Scale shape: ENCODE is map-only (codebooks fold into codegen as
  * literals — m·k tiny sqdist kernels per row, no shuffle); the ADC
  * SCAN is map-only scoring (the m·k-double table rides in as
  * literals, each row costs m array lookups + m-1 adds) followed by
  * TakeOrdered — no shuffle, no vector movement, and the scan never
  * touches the original embeddings at all, only the 32-bit codes.
  */
object ProductQuantizer {

  val dim = 64
  /** subspaces */
  val m = 8
  /** dims per subspace */
  val dsub: Int = dim / m
  /** codewords per subspace (4 bits) */
  val k = 16

  private def md5_40(s: String): Long = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 32) | ((d(1) & 0xffL) << 24) | ((d(2) & 0xffL) << 16) |
      ((d(3) & 0xffL) << 8) | (d(4) & 0xffL)
  }

  /** codebookInts(s)(c)(j): integer seeds shared verbatim with the
    * oracle SQL; component value = int/2^39 - 1 (exact double). */
  val codebookInts: IndexedSeq[IndexedSeq[IndexedSeq[Long]]] =
    (0 until m).map(s => (0 until k).map(c =>
      (0 until dsub).map(j => md5_40(s"pq_${s}_${c}_$j"))))

  private val half = (1L << 39).toDouble

  private[similarity] def centroid(s: Int, c: Int): Seq[Double] =
    codebookInts(s)(c).map(v => v.toDouble / half - 1.0)

  /** A PQ codebook: cents(s)(c) is codeword c of subspace s. */
  final case class Codebook(cents: IndexedSeq[IndexedSeq[Seq[Double]]]) {
    require(cents.length == m && cents.forall(_.length == k), "bad codebook shape")
  }

  /** The md5-derived default — the portable, value-oracle-able mode. */
  lazy val DefaultCodebook: Codebook =
    Codebook((0 until m).map(s => (0 until k).map(c => centroid(s, c))))

  /** Data-FITTED codebook: one deterministic [[KMeansCluster]] fit per
    * subspace slice (hash-order init + exact-lattice Lloyd updates —
    * layout-invariant, so the fitted codebook is reproducible across
    * runs and partitionings). m bounded k·dsub collects, the documented
    * [[KMeansCluster.update]] cost, paid once at TRAIN time. Subspaces
    * whose fit drops an empty cluster pad with the md5 default so the
    * codebook always carries k codewords. */
  def fitCodebook(df: DataFrame, vec: Column, id: Column, iters: Int = 1): Codebook = {
    val v = transform(vec, _.cast("double"))
    Codebook((0 until m).map { s =>
      val sliced = df.select(id.as("__id"), slice(v, s * dsub + 1, dsub).as("__sub"))
      val fitted = KMeansCluster
        .fit(sliced, col("__sub"), col("__id"), k, iters)
        .map(c => c.cluster -> c.vec).toMap
      (1 to k).map(c => fitted.getOrElse(c, centroid(s, c - 1))).toIndexedSeq
    })
  }

  /** 4-bit codeword of subspace `s`: argmin squared-L2 against the
    * subspace codebook, ties to the LOWEST code (array_position finds
    * the first minimum — mirrored by the oracle's lexicographic
    * list_min over [dist, code] pairs). */
  private def codeOf(vDouble: Column, s: Int, cb: Codebook): Column = {
    val sub = slice(vDouble, s * dsub + 1, dsub)
    val dists = array((0 until k).map(c =>
      VectorExprs.sqDist(sub, typedLit(cb.cents(s)(c)))): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** The packed 32-bit PQ code: Σ code_s · 16^s. */
  def packedCode(vec: Column, cb: Codebook = DefaultCodebook): Column = {
    val v = transform(vec, _.cast("double"))
    (0 until m)
      .map(s => codeOf(v, s, cb).cast("bigint") * lit(1L << (4 * s)))
      .reduce(_ + _)
  }

  /** (id, pq_code) for the whole corpus — the map-only encode pass. */
  def encode(df: DataFrame, vec: Column, id: Column,
      cb: Codebook = DefaultCodebook): DataFrame =
    df.select(id.as("id"), packedCode(vec, cb).as("pq_code"))

  /** Driver-side sub-distance: same sequential fold as
    * [[VectorExprs.sqDist]] and the oracle's list_reduce. */
  private def sqDistSeq(a: Seq[Double], b: Seq[Double]): Double = {
    var acc = 0.0
    var j = 0
    while (j < a.length) {
      val d = a(j) - b(j)
      acc += d * d
      j += 1
    }
    acc
  }

  /** ADC top-k over PRE-ENCODED codes: the m·k lookup table is
    * computed once driver-side from the probe and inlined as literals;
    * each row's approximate distance is m lookups + a fixed-order add
    * chain. `codes` is the output of [[encode]] (or its persisted
    * form — at scale you store codes, not vectors). */
  def adcTopK(codes: DataFrame, probe: Seq[Float], topk: Int,
      cb: Codebook = DefaultCodebook): DataFrame = {
    val p = probe.map(_.toDouble)
    val table: IndexedSeq[IndexedSeq[Double]] = (0 until m).map { s =>
      val sub = p.slice(s * dsub, (s + 1) * dsub)
      (0 until k).map(c => sqDistSeq(sub, cb.cents(s)(c))).toIndexedSeq
    }
    val score = (0 until m)
      .map { s =>
        val codeS = expr(s"pq_code div ${1L << (4 * s)}") % 16
        element_at(typedLit(table(s)), (codeS + 1).cast("int"))
      }
      .reduce(_ + _)
    codes
      .select(col("id").as("vec_id"), score.as("adc"))
      .orderBy(col("adc").asc, col("vec_id"))
      .limit(topk)
      .select(col("vec_id"), graft.operators.PortableRound.floorTo(col("adc"), 4).as("adc_dist"))
  }

  // ---- oracle SQL ----

  private def centList(s: Int, c: Int): String =
    codebookInts(s)(c).mkString("[", ",", "]")

  /** sqdist of embedding dims [s·8+1 .. s·8+8] vs codeword (s, c) —
    * the same sequential fold as the Spark kernel. */
  private def subDistSql(vec: String, s: Int, c: Int): String =
    s"""list_reduce(list_transform(range(1, ${dsub + 1}),
       |  j -> ($vec[${s * dsub} + j]::DOUBLE - ((${centList(s, c)})[j] / 549755813888.0 - 1.0))
       |       * ($vec[${s * dsub} + j]::DOUBLE - ((${centList(s, c)})[j] / 549755813888.0 - 1.0))), (x, y) -> x + y)""".stripMargin

  /** argmin by (dist, code): lexicographic list_min over [dist, code]
    * pairs — ties to the lowest code, like array_position-first. */
  private[similarity] def codeSql(vec: String, s: Int): String = {
    val pairs = (0 until k).map(c => s"[${subDistSql(vec, s, c)}, $c.0]")
      .mkString("[", ", ", "]")
    s"CAST((list_min($pairs))[2] AS BIGINT)"
  }

  private def packedSql(vec: String): String =
    (0 until m).map(s => s"${codeSql(vec, s)} * ${1L << (4 * s)}").mkString(" + ")

  /** qs13: every vector's packed code, value-oracled. */
  def encodeOracleSql: String =
    s"""SELECT vec_id, ${packedSql("embedding")} AS pq_code
       |FROM embeddings""".stripMargin

  /** qs14: ADC top-k for the vec_id-0 probe — table entries re-derived
    * from the same seeds, per-row score summed in the same fixed
    * subspace order (explicit add chain, never a float SUM()). */
  /** Per-subspace code columns `c0..c{m-1}` for a codes CTE — shared
    * with [[IvfPq]]'s composed oracle. */
  private[similarity] def codeColsSql(vec: String): String =
    (0 until m)
      .map(s => s"${codeSql(vec, s)} AS c$s")
      .mkString(",\n       ")

  /** The ADC score add chain over a codes CTE aliased `z` and a probe
    * CTE aliased `p` (column `pe`): each subspace is a 16-way CASE
    * picking the probe-vs-codeword sub-distance, summed in fixed
    * subspace order (explicit add chain, never a float SUM()). */
  private[similarity] def adcChainSql: String = {
    def caseSql(s: Int): String = {
      val whens = (0 until k)
        .map(c => s"WHEN z.c$s = $c THEN (${subDistSql("p.pe", s, c)})")
        .mkString(" ")
      s"(CASE $whens END)"
    }
    (0 until m).map(caseSql).mkString(" + ")
  }

  def adcOracleSql(topk: Int): String = {
    // codes computed ONCE per row (a codes CTE), then the shared CASE
    // chain scores them against the probe
    val codeCols = codeColsSql("embedding")
    val chain = adcChainSql
    s"""WITH p AS (SELECT embedding AS pe FROM embeddings WHERE vec_id = 0),
       |codes AS (
       |  SELECT vec_id, $codeCols
       |  FROM embeddings)
       |SELECT vec_id, (floor((adc) * 10000.0) / 10000.0) AS adc_dist FROM (
       |  SELECT z.vec_id, $chain AS adc
       |  FROM codes z, p) z2
       |ORDER BY adc, vec_id LIMIT $topk""".stripMargin
  }
}
