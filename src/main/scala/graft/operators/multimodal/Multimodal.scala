package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches. DECODE does
  * real header-level container parsing for PNG/JPEG/GIF/BMP (pure JVM,
  * no native codecs needed); other payloads fall back to a
  * clearly-marked deterministic stub. RESIZE and FRAME-SAMPLE remain
  * metadata-shape stubs (re-encoding needs real codecs), but the
  * plumbing around every step (schema, batch iteration via
  * mapPartitions, partitioning discipline, metadata propagation) is
  * the production shape: a JNI/codec call slots in and nothing else
  * changes.
  *
  * Scale notes: media bytes never enter a shuffle here — decode is a
  * narrow map; only the small metadata rows flow onward. Keep the
  * binary column out of groupBy/join keys, and size input partitions
  * by `spark.sql.files.maxPartitionBytes` so a batch of blobs fits in
  * executor memory.
  */
object Multimodal {

  final case class MediaRow(id: Long, mediaType: String, content: Array[Byte])
  final case class MediaMeta(
      id: Long,
      mediaType: String,
      nBytes: Int,
      width: Int,
      height: Int,
      checksum: Long)
  final case class Frame(id: Long, frameIndex: Int, offset: Long, frameChecksum: Long)

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit payload checksum: first 15 hex chars of md5 — the same
    * value `CAST('0x'||substring(md5(payload),1,15) AS BIGINT)` yields
    * in DuckDB, so stub outputs are value-oracle-able (qm02, qm03). */
  private[multimodal] def md5_60(bytes: Array[Byte], from: Int, until: Int): Long = {
    val md = md5Local.get()
    md.reset()
    val hi = math.min(until, bytes.length)
    if (from < hi) md.update(bytes, from, hi - from)
    val d = md.digest()
    ((d(0) & 0xffL) << 52) | ((d(1) & 0xffL) << 44) | ((d(2) & 0xffL) << 36) |
      ((d(3) & 0xffL) << 28) | ((d(4) & 0xffL) << 20) | ((d(5) & 0xffL) << 12) |
      ((d(6) & 0xffL) << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Fixture adapter: treat a text column's UTF-8 bytes as the opaque
    * payload (the fixtures ship no real media). */
  def asMedia(df: DataFrame, idCol: String, payloadCol: String,
      mediaType: String = "text/plain"): DataFrame =
    df.select(
      col(idCol).as("id"),
      lit(mediaType).as("media_type"),
      col(payloadCol).cast("binary").as("content"))

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

  /** Real image-container parse: (mime, width, height) for PNG / JPEG /
    * GIF / BMP payloads, `None` for anything else. Header-only — O(few
    * hundred bytes) per blob, NO pixel decode (`ImageIO.read` would
    * decompress every image just to learn its size; at corpus scale
    * that is the whole job's CPU). Pure-JVM byte parsing of the public
    * container formats, so it runs in any executor without native
    * codecs. */
  private[operators] def imageDims(b: Array[Byte]): Option[(String, Int, Int)] = {
    // PNG: 8-byte signature, IHDR chunk fixed at offset 8 (len+type+13)
    if (b.length >= 24 &&
      (b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
      b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("image/png", be32(b, 16), be32(b, 20)))
    // GIF87a / GIF89a: logical screen size, little-endian at 6/8
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("image/gif", le16(b, 6), le16(b, 8)))
    // BMP: "BM" alone is 2 ASCII bytes any text can start with
    // ("BMW dealers..."), so require the BITMAPINFOHEADER-family DIB
    // size at 14 and planes == 1 at 26 before trusting width/height at
    // 18/22 (height may be negative = top-down rows)
    else if (b.length >= 30 && b(0) == 'B' && b(1) == 'M' && {
      val dib = le32(b, 14)
      // BITMAPINFOHEADER family incl. OS/2 2.x (64)
      (dib == 40 || dib == 52 || dib == 56 || dib == 64 || dib == 108 ||
        dib == 124) && le16(b, 26) == 1
    })
      Some(("image/bmp", le32(b, 18), math.abs(le32(b, 22))))
    // JPEG: walk the segment chain to the first frame header (SOFn)
    else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var i = 2
      while (i + 9 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        if (marker == 0xff) { i += 1 } // fill byte
        else if (marker >= 0xd0 && marker <= 0xd9) { i += 2 } // standalone
        else {
          val len = be16(b, i + 2)
          if (len < 2) return None
          // SOF0..SOF15 carry the frame size, except the non-frame
          // markers interleaved in that range: DHT(C4), JPG(C8), DAC(CC)
          if (marker >= 0xc0 && marker <= 0xcf &&
            marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
            if (i + 9 >= b.length) return None
            return Some(("image/jpeg", be16(b, i + 7), be16(b, i + 5)))
          }
          i += 2 + len
        }
      }
      None
    } else None
  }

  final case class AudioMeta(
      id: Long,
      mediaType: String,
      nBytes: Int,
      channels: Int,
      sampleRate: Int,
      durationMs: Long,
      checksum: Long)

  /** Real audio-container parse: (mime, channels, sampleRate,
    * durationMs) for WAV (RIFF chunk walk: `fmt ` + `data`) and FLAC
    * (STREAMINFO bit unpack), `None` otherwise. Header-only like
    * [[imageDims]] — no sample decode, pure JVM. */
  private[operators] def audioMeta(b: Array[Byte]): Option[(String, Int, Int, Long)] = {
    // WAV: RIFF....WAVE, then word-aligned chunks
    if (b.length >= 36 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E') {
      var i = 12
      var channels = 0
      var rate = 0
      var byteRate = 0
      var dataLen = -1L
      while (i + 8 <= b.length && (channels == 0 || dataLen < 0)) {
        val isFmt = b(i) == 'f' && b(i + 1) == 'm' && b(i + 2) == 't' && b(i + 3) == ' '
        val isData = b(i) == 'd' && b(i + 1) == 'a' && b(i + 2) == 't' && b(i + 3) == 'a'
        val len = le32(b, i + 4).toLong & 0xffffffffL
        if (isFmt && i + 24 <= b.length) {
          channels = le16(b, i + 10)
          rate = le32(b, i + 12)
          byteRate = le32(b, i + 16)
        } else if (isData) dataLen = len
        // chunks are word-aligned; a corrupt length ends the walk
        if (len > b.length) return None
        i += 8 + len.toInt + (len.toInt & 1)
      }
      if (channels > 0 && rate > 0 && byteRate > 0 && dataLen >= 0)
        Some(("audio/wav", channels, rate, dataLen * 1000L / byteRate))
      else None
    }
    // FLAC: fLaC + STREAMINFO first metadata block (spec-mandated)
    else if (b.length >= 26 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C' &&
      (b(4) & 0x7f) == 0) {
      // STREAMINFO at byte 8: 10 bytes of block sizes, then
      // 20-bit sample rate | 3-bit channels-1 | 5-bit bps-1 | 36-bit samples
      val sr = ((b(18) & 0xff) << 12) | ((b(19) & 0xff) << 4) | ((b(20) & 0xff) >>> 4)
      val ch = (((b(20) & 0xff) >> 1) & 0x7) + 1
      val total = ((b(21) & 0xfL) << 32) | ((b(22) & 0xffL) << 24) |
        ((b(23) & 0xffL) << 16) | ((b(24) & 0xffL) << 8) | (b(25) & 0xffL)
      if (sr > 0) Some(("audio/flac", ch, sr, total * 1000L / sr)) else None
    } else None
  }

  /** AUDIO DECODE: real WAV/FLAC header parse with the same
    * deterministic checksum-derived stub fallback as [[decode]] for
    * non-audio payloads (keeps the text-fixture oracle, qm04). Narrow
    * mapPartitions; bytes never shuffle. */
  def decodeAudio(media: DataFrame)(implicit spark: SparkSession): Dataset[AudioMeta] = {
    import spark.implicits._
    media.select("id", "media_type", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, mt, bytes) =>
          val ck = md5_60(bytes, 0, bytes.length)
          audioMeta(bytes) match {
            case Some((mime, ch, sr, ms)) =>
              AudioMeta(id, mime, bytes.length, ch, sr, ms, ck)
            case None =>
              // STUB fallback: plausible audio metadata derived from
              // the checksum — deterministic and SQL-expressible
              AudioMeta(id, mt, bytes.length,
                1 + (ck % 2).toInt,
                8000 + ((ck % 5).toInt * 8000),
                (ck >> 10) % 600000L,
                ck)
          }
        }
      }
  }

  /** DECODE. Real header-level container parsing for the formats a
    * plain JVM can read (see [[imageDims]]); payloads that are not
    * recognizable media — including this repo's text fixtures — fall
    * back to the deterministic checksum-derived stub dimensions, which
    * keeps the output value-oracle-able (qm02). The per-partition
    * batch shape is the production one: a native codec for further
    * formats slots into [[imageDims]] and nothing else changes. */
  def decode(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("id", "media_type", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, mt, bytes) =>
          val ck = md5_60(bytes, 0, bytes.length)
          imageDims(bytes) match {
            case Some((mime, w, h)) => MediaMeta(id, mime, bytes.length, w, h, ck)
            case None =>
              // STUB fallback: dims derived from the checksum
              // (non-negative by construction, < 2^60) so non-media
              // payloads still produce deterministic, testable metadata
              val w = 64 + (ck % 1024).toInt
              val h = 64 + ((ck >> 10) % 1024).toInt
              MediaMeta(id, mt, bytes.length, w, h, ck)
          }
        }
      }
  }

  /** Former name of [[decode]], kept for source compatibility; the
    * decode is no longer a stub for PNG/JPEG/GIF/BMP payloads. */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] =
    decode(media)

  /** RESIZE — STUB: metadata-only transform (a real one re-encodes the
    * payload); keeps the (w, h) contract downstream code relies on. */
  def resizeStub(meta: Dataset[MediaMeta], maxSide: Int)(
      implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    meta.map { m =>
      val scale = math.min(1.0, maxSide.toDouble / math.max(m.width, m.height))
      m.copy(
        width = math.max(1, (m.width * scale).toInt),
        height = math.max(1, (m.height * scale).toInt))
    }
  }

  /** FRAME SAMPLE — STUB: emits every `stride`-th "frame" (fixed-size
    * byte slice) with a per-frame checksum; the real version seeks the
    * container format. One row in, few rows out — flatMap shape. */
  def frameSampleStub(media: DataFrame, frameBytes: Int, stride: Int)(
      implicit spark: SparkSession): Dataset[Frame] = {
    import spark.implicits._
    media.select("id", "content").as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        val nFrames = math.max(1, bytes.length / frameBytes)
        (0 until nFrames by stride).map { f =>
          val off = f.toLong * frameBytes
          Frame(id, f, off, md5_60(bytes, off.toInt, off.toInt + frameBytes))
        }
      }
  }
}
