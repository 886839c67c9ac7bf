package graft.operators.multimodal

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Barrier

/** Perceptual image near-duplicate detection: a 64-bit difference hash
  * (dHash) over REAL decoded pixels, paired by the same blocked-Hamming
  * machinery as [[graft.operators.dedup.PortableSimHash]]. This closes
  * the image-dedup gap: [[Multimodal.decode]] stops at header metadata
  * (byte-checksum exact dups only); dHash catches re-encoded, resized
  * and lightly-edited copies. (No reference analog — the reference
  * passes BLOBs through untouched; part of the added LLM-pipeline
  * surface.)
  *
  * Determinism: the pixel→hash path is integer-only — block-averaged
  * luminance on integer-floor block boundaries, (299r+587g+114b)/1000
  * luma, strict `<` comparisons — so the same pixels give the same
  * hash on any JVM, and a fixture whose pixels are a known function is
  * value-oracle-able end to end (qm05).
  *
  * Scale notes: decode is a narrow map over the binary column — blobs
  * never shuffle, only (id, 64-bit hash) rows flow onward; decode cost
  * is capped per payload (`maxDecodeBytes` — an oversized or corrupt
  * blob costs a header sniff, not a decompression bomb); the pair join
  * is blocked exactly like [[graft.operators.dedup.SimHashDedup]], so
  * it inherits that sub-quadratic discipline.
  */
object PerceptualHash {

  // ImageIO defaults to staging every read/write through a temp FILE
  // (FileCache image streams); for thousands of small in-memory
  // payloads that disk round-trip dominates the actual decode. Memory
  // cache only — set once per JVM when the object loads (driver and
  // each executor hit this before their first decode).
  ImageIO.setUseCache(false)

  /** dHash grid: 9 columns x 8 rows -> 8x8 = 64 horizontal-gradient
    * bits. */
  val GridW = 9
  val GridH = 8

  /** Block-averaged integer luminance grid. Boundaries are integer
    * floor (`gx*w/9`), averages are integer division — no float
    * resampling anywhere, so the grid is bit-stable across JVMs. A
    * 9x8 input maps through untouched (each block is one pixel). */
  private[multimodal] def lumaGrid(img: BufferedImage): Array[Int] = {
    val raster = img.getRaster
    val bands = raster.getNumBands
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Int](GridW * GridH)
    var gy = 0
    while (gy < GridH) {
      var gx = 0
      while (gx < GridW) {
        val x0 = math.min(gx * w / GridW, w - 1)
        val y0 = math.min(gy * h / GridH, h - 1)
        val x1 = math.max(x0 + 1, math.min((gx + 1) * w / GridW, w))
        val y1 = math.max(y0 + 1, math.min((gy + 1) * h / GridH, h))
        var sum = 0L
        var n = 0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            // < 3 bands = gray or gray+alpha (PNG color type 4): band 0
            // IS the luminance; >= 3 = RGB(A): integer BT.601 weights
            val lum =
              if (bands < 3) raster.getSample(x, y, 0)
              else {
                val r = raster.getSample(x, y, 0)
                val g = raster.getSample(x, y, 1)
                val b = raster.getSample(x, y, 2)
                (299 * r + 587 * g + 114 * b) / 1000
              }
            sum += lum
            n += 1
            x += 1
          }
          y += 1
        }
        out(gy * GridW + gx) = (sum / n).toInt
        gx += 1
      }
      gy += 1
    }
    out
  }

  /** Bit y*8+x is set when grid(x,y) < grid(x+1,y) — the standard
    * horizontal-gradient dHash. */
  private[multimodal] def dHashFromGrid(g: Array[Int]): Long = {
    var bits = 0L
    var y = 0
    while (y < GridH) {
      var x = 0
      while (x < GridW - 1) {
        if (g(y * GridW + x) < g(y * GridW + x + 1))
          bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Decode + dHash, None when the payload is over the decode-cost cap,
    * not a container [[Multimodal.imageDims]] recognizes, or fails to
    * decode. The header sniff runs BEFORE ImageIO so arbitrary bytes
    * (the text fixtures, junk blobs) are rejected in nanoseconds. */
  def dHash64(bytes: Array[Byte], maxDecodeBytes: Int = 1 << 22): Option[Long] = {
    if (bytes.length > maxDecodeBytes) None
    else if (Multimodal.imageDims(bytes).isEmpty) None
    else
      try {
        val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
        if (img == null) None else Some(dHashFromGrid(lumaGrid(img)))
      } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** (id, dhash) per payload — narrow mapPartitions over the media
    * frame ([[Multimodal.asMedia]] schema); null dhash for payloads
    * that do not decode. */
  def dHashes(media: DataFrame, maxDecodeBytes: Int = 1 << 22)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    // decode is the expensive stage — a one-split source would run it
    // on a single task (see Parallelism; no-op on wide inputs)
    graft.operators.Parallelism.ensureMin(media)
      .select("id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => (id, dHash64(bytes, maxDecodeBytes)) })
      .toDF("id", "dhash")
  }

  /** Near-dup image pairs (doc_a < doc_b, Hamming <= maxHamming)
    * within a blocking key — the [[graft.operators.dedup.PortableSimHash.pairsWithinBlock]]
    * shape: hashes cross a [[Barrier]] (two join sides; without it the
    * lineage re-decodes every image per side), the join moves only
    * (block, id, 64-bit hash). Undecodable payloads drop out before
    * the join. */
  def pairsWithinBlock(
      media: DataFrame,
      block: Column,
      maxHamming: Int,
      maxDecodeBytes: Int = 1 << 22,
      maxBlock: Int = DefaultMaxBlock)(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hashed = graft.operators.Parallelism.ensureMin(media)
      .select(block.cast("string").as("blk"), col("id"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions(_.map { case (blk, id, bytes) =>
        (blk, id, dHash64(bytes, maxDecodeBytes))
      })
      .toDF("blk", "id", "dh")
    blockedHammingPairs(hashed, maxHamming, maxBlock)
  }

  /** Hot-block cap: a block this populous is either an exact-dup flood
    * (all-black thumbnails, silence clips — exact-dedup fodder, not
    * near-dup work) or a degenerate blocking key; expanding it is
    * quadratic. Mirrors [[graft.operators.dedup.MinHashLSH]]'s
    * `maxBucket` = 1000. */
  val DefaultMaxBlock = 1000

  /** The shared (blk, id, dh) → near-dup-pair join: Barrier'd hashes
    * (two sides read them; without it the lineage re-decodes every
    * payload per side), equi-join on the block, 64-bit XOR popcount.
    * Also the audio-hash pair path ([[PerceptualAudio]]).
    *
    * Blocks over `maxBlock` rows are dropped BEFORE the self-join (the
    * overflow key list is tiny — degenerate floods — so it broadcasts;
    * same guard shape as `MinHashLSH.candidatePairs`), keeping the pair
    * expansion Σ n_b² bounded by (#blocks)·maxBlock² instead of
    * quadratic in the hottest block. */
  private[multimodal] def blockedHammingPairs(
      hashed: DataFrame, maxHamming: Int,
      maxBlock: Int = DefaultMaxBlock): DataFrame = {
    val h = hashed.filter(col("dh").isNotNull).transform(Barrier.apply)
    val big = h.groupBy("blk").count()
      .filter(col("count") > maxBlock)
      .select("blk")
    val capped = h.join(broadcast(big), Seq("blk"), "left_anti")
    val a = capped.select(col("blk"), col("id").as("doc_a"), col("dh").as("dh_a"))
    val b = capped.select(col("blk"), col("id").as("doc_b"), col("dh").as("dh_b"))
    a.join(b, Seq("blk"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("dh_a").bitwiseXOR(col("dh_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Default near-dup pairing: no caller-invented blocking column —
    * blocks are multi-table prefixes of the dHash itself, the
    * [[graft.operators.dedup.SimHashDedup]] banding. The 64-bit hash
    * splits into `bands` keys of 64/bands bits; any pair within
    * Hamming h <= bands-1 agrees on at least one whole band
    * (pigeonhole), so recall is EXACT for maxHamming <= bands-1 —
    * recall/cost is the `bands` parameter, not caller ingenuity. The
    * default 4 bands of 16 bits is the SimHashDedup discipline
    * (65k-value keys stay selective at billion scale, h <= 3); widen
    * `bands` to raise the exact-recall bound at the cost of coarser
    * keys. Band buckets over `maxBlock` are dropped+capped exactly
    * like the keyed path. Scale shape: the bucket join moves only
    * (band, key, id, 8-byte hash); candidate duplicates collapse
    * AFTER the cheap Hamming filter. */
  def pairs(
      media: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      maxDecodeBytes: Int = 1 << 22,
      maxBlock: Int = DefaultMaxBlock)(implicit spark: SparkSession): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"exact recall needs maxHamming < bands (got $maxHamming >= $bands)")
    bandedHammingPairs(dHashes(media, maxDecodeBytes), maxHamming, bands, maxBlock)
  }

  /** The shared (id, dhash) → banded near-dup-pair join behind
    * [[pairs]] (also [[PerceptualAudio.pairs]]): explode each hash into
    * (band, 64/bands-bit key), cap hot buckets, equi-join per band,
    * dedup pairs after the Hamming filter. */
  private[multimodal] def bandedHammingPairs(
      hashes: DataFrame, maxHamming: Int, bands: Int, maxBlock: Int): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    val h = hashes.filter(col("dhash").isNotNull).transform(Barrier.apply)
    val banded = h.select(
      col("id"), col("dhash"),
      posexplode(array((0 until bands).map(i =>
        shiftrightunsigned(col("dhash"), i * width).bitwiseAND(lit(mask))): _*))
        .as(Seq("band", "bkey")))
    val big = banded.groupBy("band", "bkey").count()
      .filter(col("count") > maxBlock)
      .select("band", "bkey")
    val capped = banded.join(broadcast(big), Seq("band", "bkey"), "left_anti")
    val a = capped.select(col("band"), col("bkey"),
      col("id").as("doc_a"), col("dhash").as("dh_a"))
    val b = capped.select(col("band"), col("bkey"),
      col("id").as("doc_b"), col("dhash").as("dh_b"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming",
        bit_count(col("dh_a").bitwiseXOR(col("dh_b"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .dropDuplicates("doc_a", "doc_b")
  }

  // ---- planted-fixture support (qm05): the corpus ships no images, so
  // the query plants deterministic 9x8 grayscale PNGs derived from
  // doc_id — same trick as qt16's in-query PII injection. Even/odd ids
  // within a pair-group render near-identical pixels, so the REAL
  // decode -> grid -> hash -> Hamming pipeline runs end to end and
  // every value is reproducible in SQL.

  /** Planted pixel value: base = (group * 1000003 + y*131 + x*17) mod
    * 251 with group = docId/2; odd ids brighten every pixel by one
    * (saturating at 250) — a near-identical copy whose dHash differs
    * only where the saturation boundary flips a comparison. */
  def plantedPixel(docId: Long, x: Int, y: Int): Int = {
    val base = ((docId / 2) * 1000003L + y * 131L + x * 17L) % 251L
    if (docId % 2 == 1) math.min(250L, base + 1L).toInt else base.toInt
  }

  /** The planted 9x8 grayscale PNG for a doc id — real PNG bytes via
    * ImageIO, so qm05 exercises the genuine container decode path. */
  def plantedPng(docId: Long): Array[Byte] = {
    val img = new BufferedImage(GridW, GridH, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    var y = 0
    while (y < GridH) {
      var x = 0
      while (x < GridW) {
        r.setSample(x, y, 0, plantedPixel(docId, x, y))
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private[multimodal] def pixSqlAt(idRef: String, x: String, y: String): String =
    s"(CASE WHEN $idRef % 2 = 1 THEN LEAST(250, (($idRef // 2) * 1000003 + ($y) * 131 + ($x) * 17) % 251 + 1) " +
      s"ELSE (($idRef // 2) * 1000003 + ($y) * 131 + ($x) * 17) % 251 END)"

  private def pixSql(x: String, y: String): String = pixSqlAt("doc_id", x, y)

  /** The 64-bit planted dHash as a bare SQL expression over an
    * arbitrary integer id expression — the [[dhCte]] fold lifted out of
    * its documents-bound CTE so derived id spaces (qm13's video-frame
    * equivalents) hash identically. */
  private[multimodal] def dhExprSql(idRef: String): String =
    s"""CAST(list_sum(list_transform(range(0, 64), i ->
       |  CASE WHEN ${pixSqlAt(idRef, "i % 8", "i // 8")} < ${pixSqlAt(idRef, "i % 8 + 1", "i // 8")}
       |       THEN (CASE WHEN i = 63 THEN -9223372036854775807 - 1
       |                  ELSE (1::BIGINT << CAST(i AS INT)) END)
       |       ELSE 0 END)) AS BIGINT)""".stripMargin

  /** The planted-dHash CTE: per-doc 64-bit hash from the pixel
    * function (bit 63 is the BIGINT sign bit — 1<<63 overflows
    * DuckDB's checked shift, so it is emitted as min-BIGINT; bits
    * 0..62 sum below 2^63, so the total stays in range and equals the
    * Spark side's signed Long). */
  private def dhCte: String =
    s"""dh AS (
       |  SELECT doc_id, ${dhExprSql("doc_id")} AS dh
       |  FROM documents)""".stripMargin

  /** DuckDB rendition of qm05: re-derives the planted pixels, folds the
    * 64 gradient bits, and joins within the doc_id/2 pair-group —
    * value-oracling the whole decode->dHash->blocked-Hamming pipeline
    * (the PNG encode/decode roundtrip is lossless, and the 9x8 fixture
    * passes through [[lumaGrid]] untouched, so pixels ARE the grid). */
  def oracleSql(maxHamming: Int): String =
    s"""WITH $dhCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
       |FROM dh a JOIN dh b ON a.doc_id // 2 = b.doc_id // 2 AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dh, b.dh)) <= $maxHamming""".stripMargin

  /** DuckDB rendition of qm08 ([[pairs]] — default dHash-prefix
    * blocking, no caller key): because banding is EXACTLY lossless for
    * maxHamming <= bands-1, the oracle is the brute-force all-pairs
    * Hamming join over the planted hashes — the green hash match IS
    * the recall proof against the unblocked formulation. */
  def oracleAllPairsSql(maxHamming: Int): String =
    s"""WITH $dhCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
       |FROM dh a JOIN dh b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dh, b.dh)) <= $maxHamming""".stripMargin

  /** qm07: duplicate-cluster labels over the image pair graph — the
    * qd16 recursive transitive-closure oracle applied to the dHash
    * edges (every doc labeled with the least id reachable; singletons
    * label themselves). */
  def oracleComponentsSql(maxHamming: Int): String =
    s"""WITH RECURSIVE $dhCte,
       |edges AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b
       |  FROM dh a JOIN dh b ON a.doc_id // 2 = b.doc_id // 2 AND a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.dh, b.dh)) <= $maxHamming),
       |sym AS (SELECT a, b FROM edges UNION SELECT b AS a, a AS b FROM edges),
       |reach AS (
       |  SELECT a AS node, b AS other FROM sym
       |  UNION
       |  SELECT r.node, s.b AS other FROM reach r JOIN sym s ON r.other = s.a
       |)
       |SELECT d.doc_id,
       |       least(d.doc_id, coalesce(m.mn, d.doc_id)) AS component
       |FROM documents d
       |LEFT JOIN (SELECT node, min(other) AS mn FROM reach GROUP BY node) m
       |  ON d.doc_id = m.node""".stripMargin
}
