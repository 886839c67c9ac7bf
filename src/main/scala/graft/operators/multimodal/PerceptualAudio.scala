package graft.operators.multimodal

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual audio near-duplicate detection over REAL decoded PCM:
  * WAV 16-bit samples are parsed straight from the container (pure
  * JVM — PCM needs no codec), folded into a 65-window mean-loudness
  * envelope, and hashed as the 64-bit sign of adjacent envelope
  * gradients. The contour is GAIN-INVARIANT (scaling every sample
  * scales every window mean, comparisons survive), so re-mastered /
  * re-normalized copies of one recording collide — the audio analog of
  * [[PerceptualHash]]'s dHash, sharing its blocked-Hamming pair join.
  *
  * Determinism: integer-only throughout — per-window |sample| sums,
  * cross-multiplied mean comparisons (no division), strict `>` — so a
  * fixture whose samples are a known function is value-oracle-able end
  * to end (qm06). Compressed containers (FLAC/MP3) need real codecs
  * and return None, the [[Multimodal]] stub convention.
  *
  * Scale notes: decode is a narrow map, payload bytes never shuffle,
  * per-payload cost capped by `maxDecodeBytes`; only (block, id, hash)
  * rows enter the pair join.
  */
object PerceptualAudio {

  /** 65 envelope windows -> 64 gradient bits. */
  val Windows = 65

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** RIFF walk to the PCM16 payload: (dataOffset, dataBytes, channels)
    * for WAV containers with audioFormat=1 (plain PCM) and 16-bit
    * samples; None otherwise. */
  private[multimodal] def pcm16Info(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b.length < 36 || b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
      b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E') return None
    var i = 12
    var channels = 0
    var ok = false
    var dataOff = -1
    var dataLen = -1
    while (i + 8 <= b.length && (channels == 0 || dataOff < 0)) {
      val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
      val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
      val len = le32(b, i + 4).toLong & 0xffffffffL
      if (isFmt && i + 24 <= b.length) {
        ok = le16(b, i + 8) == 1 && le16(b, i + 22) == 16 // PCM, 16-bit
        channels = le16(b, i + 10)
      } else if (isData) {
        dataOff = i + 8
        dataLen = math.min(len, (b.length - dataOff).toLong).toInt
      }
      if (len > b.length) return None
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (ok && channels > 0 && dataOff >= 0) Some((dataOff, dataLen, channels))
    else None
  }

  /** 64-bit loudness-contour hash of a WAV payload: mean |PCM16| of
    * channel 0 over 65 integer-floor windows; bit i set when window
    * i's mean exceeds window i+1's (compared by cross-multiplication —
    * exact, no float division). None for non-WAV/over-cap payloads or
    * streams shorter than one sample per window. */
  def audioHash64(bytes: Array[Byte], maxDecodeBytes: Int = 1 << 22): Option[Long] = {
    if (bytes.length > maxDecodeBytes) return None
    pcm16Info(bytes) match {
      case Some((off, len, ch)) =>
        val n = len / (2 * ch)
        if (n < Windows) None
        else {
          val sums = new Array[Long](Windows)
          val cnts = new Array[Long](Windows)
          var j = 0
          while (j < Windows) {
            val s0 = j * n / Windows
            val s1 = math.max(s0 + 1, (j + 1) * n / Windows)
            var acc = 0L
            var t = s0
            while (t < s1) {
              val p = off + t * 2 * ch
              acc += math.abs(((bytes(p) & 0xff) | (bytes(p + 1) << 8)).toShort.toInt)
              t += 1
            }
            sums(j) = acc
            cnts(j) = s1 - s0
            j += 1
          }
          var bits = 0L
          var i = 0
          while (i < Windows - 1) {
            if (sums(i) * cnts(i + 1) > sums(i + 1) * cnts(i)) bits |= 1L << i
            i += 1
          }
          Some(bits)
        }
      case None => None
    }
  }

  /** Near-dup audio pairs within a blocking key — hash in a narrow
    * map, then [[PerceptualHash.blockedHammingPairs]]. */
  def pairsWithinBlock(
      media: DataFrame,
      block: Column,
      maxHamming: Int,
      maxDecodeBytes: Int = 1 << 22,
      maxBlock: Int = PerceptualHash.DefaultMaxBlock)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    val hashed = graft.operators.Parallelism.ensureMin(media)
      .select(block.cast("string").as("blk"), col("id"), col("content"))
      .as[(String, Long, Array[Byte])]
      .mapPartitions(_.map { case (blk, id, bytes) =>
        (blk, id, audioHash64(bytes, maxDecodeBytes))
      })
      .toDF("blk", "id", "dh")
    PerceptualHash.blockedHammingPairs(hashed, maxHamming, maxBlock)
  }

  /** (id, dhash) per payload — the audio analog of
    * [[PerceptualHash.dHashes]]. */
  def audioHashes(media: DataFrame, maxDecodeBytes: Int = 1 << 22)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.operators.Parallelism.ensureMin(media)
      .select("id", "content").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, audioHash64(bytes, maxDecodeBytes))
      })
      .toDF("id", "dhash")
  }

  /** Default near-dup pairing with no caller blocking column — bands
    * of the contour hash itself are the blocks
    * ([[PerceptualHash.pairs]] semantics: exact recall for
    * maxHamming <= bands-1, hot buckets capped). */
  def pairs(
      media: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      maxDecodeBytes: Int = 1 << 22,
      maxBlock: Int = PerceptualHash.DefaultMaxBlock)(
      implicit spark: SparkSession): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"exact recall needs maxHamming < bands (got $maxHamming >= $bands)")
    PerceptualHash.bandedHammingPairs(
      audioHashes(media, maxDecodeBytes), maxHamming, bands, maxBlock)
  }

  // ---- planted-fixture support (qm06): deterministic 130-sample WAVs
  // derived from doc_id — non-negative samples so truncating integer
  // division matches DuckDB's floor division, 2 samples per window so
  // the envelope is a closed form both engines compute.

  /** Planted sample t of a doc:
    * base = (g·37 + t²·13 + g·t·7 + (g div 20001)·(t+13)·5) mod 20001
    * with g = docId/2; odd ids are a 0.9-gain copy (floor(s·9/10)) —
    * the re-normalized near-duplicate the contour hash must catch.
    * The two g-dependent SLOPE terms are the round-15 fixture fix:
    * the original g·37 offset was constant across t, so it cancelled
    * in every window comparison and only mod-20001 wraps
    * differentiated groups — the contour space was low-entropy by
    * construction and the 10× scale smoke measured banding fan-in,
    * not the operator (the qm14 adjudication). g·t·7 varies the
    * gradient within a modulus period; the (g div 20001) epoch term
    * keeps hashes spreading PAST the period, so replica-shifted id
    * spaces (ScaleSmoke's +r·10⁸) decorrelate instead of colliding
    * back onto 20001 contours. Measured spread (offline sweep):
    * 60k ids → 24k distinct hashes, max band-bucket 112; 600k ids
    * (10 replicas) → 125k distinct, max bucket 573 — both under the
    * production maxBlock=1000 default, so qm14 runs uncapped-exact
    * at every fixture scale and its smoke measures the join. */
  def plantedSample(docId: Long, t: Int): Int = {
    val g = docId / 2
    val base = ((g * 37L + t.toLong * t * 13L + g * t * 7L +
      (g / 20001L) * (t + 13L) * 5L) % 20001L).toInt
    if (docId % 2 == 1) (base * 9) / 10 else base
  }

  /** The planted mono 8 kHz PCM16 WAV (130 samples = 2 per window). */
  def plantedWav(docId: Long): Array[Byte] = {
    val n = 2 * Windows
    val dataLen = n * 2
    val out = new Array[Byte](44 + dataLen)
    def putStr(i: Int, s: String): Unit = s.zipWithIndex.foreach {
      case (c, k) => out(i + k) = c.toByte
    }
    def put16(i: Int, v: Int): Unit = {
      out(i) = (v & 0xff).toByte; out(i + 1) = ((v >> 8) & 0xff).toByte
    }
    def put32(i: Int, v: Int): Unit = {
      put16(i, v & 0xffff); put16(i + 2, (v >>> 16) & 0xffff)
    }
    putStr(0, "RIFF"); put32(4, 36 + dataLen); putStr(8, "WAVE")
    putStr(12, "fmt "); put32(16, 16)
    put16(20, 1); put16(22, 1) // PCM, mono
    put32(24, 8000); put32(28, 16000) // rate, byteRate
    put16(32, 2); put16(34, 16) // blockAlign, bits
    putStr(36, "data"); put32(40, dataLen)
    var t = 0
    while (t < n) {
      put16(44 + t * 2, plantedSample(docId, t) & 0xffff)
      t += 1
    }
    out
  }

  private[multimodal] def sampSqlAt(idRef: String, t: String): String = {
    val raw = s"(($idRef // 2) * 37 + ($t) * ($t) * 13 + ($idRef // 2) * ($t) * 7" +
      s" + ($idRef // 2 // 20001) * (($t) + 13) * 5) % 20001"
    s"(CASE WHEN $idRef % 2 = 1 THEN ($raw) * 9 // 10 ELSE $raw END)"
  }

  private def sampSql(t: String): String = sampSqlAt("doc_id", t)

  /** The 64-bit planted contour hash as a bare SQL expression over an
    * arbitrary integer id expression — the [[ahCte]] fold lifted out
    * of its documents-bound CTE so derived id spaces (qm14's stream
    * segments) hash identically. */
  private[multimodal] def ahExprSql(idRef: String): String =
    s"""CAST(list_sum(list_transform(range(0, ${Windows - 1}), i ->
       |  CASE WHEN (${sampSqlAt(idRef, "2 * i")} + ${sampSqlAt(idRef, "2 * i + 1")})
       |           > (${sampSqlAt(idRef, "2 * (i + 1)")} + ${sampSqlAt(idRef, "2 * (i + 1) + 1")})
       |       THEN (CASE WHEN i = 63 THEN -9223372036854775807 - 1
       |                  ELSE (1::BIGINT << CAST(i AS INT)) END)
       |       ELSE 0 END)) AS BIGINT)""".stripMargin

  /** DuckDB rendition of qm06: re-derives the planted samples, folds
    * the 65-window envelope (2 samples each — counts equal, so the
    * gradient comparison is a plain `>`), builds the 64-bit contour
    * hash (sign bit via the min-BIGINT trick, see
    * [[PerceptualHash.oracleSql]]) and joins within the doc_id/2
    * pair-group. */
  private def ahCte: String =
    s"""ah AS (
       |  SELECT doc_id, ${ahExprSql("doc_id")} AS dh
       |  FROM documents)""".stripMargin

  def oracleSql(maxHamming: Int): String =
    s"""WITH $ahCte
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.dh, b.dh)) AS INT) AS hamming
       |FROM ah a JOIN ah b ON a.doc_id // 2 = b.doc_id // 2 AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.dh, b.dh)) <= $maxHamming""".stripMargin

  /** qm10: duplicate-cluster labels over the audio pair graph — the
    * qm07/qd16 recursive transitive-closure oracle applied to the
    * contour-hash edges (every doc labeled with the least id
    * reachable; singletons label themselves). */
  def oracleComponentsSql(maxHamming: Int): String =
    s"""WITH RECURSIVE $ahCte,
       |edges AS (
       |  SELECT a.doc_id AS a, b.doc_id AS b
       |  FROM ah a JOIN ah b ON a.doc_id // 2 = b.doc_id // 2 AND a.doc_id < b.doc_id
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
