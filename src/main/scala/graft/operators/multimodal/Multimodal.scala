package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition in batches. The container
  * has no image/audio codecs, so the DECODE step is a clearly-marked
  * deterministic stub — but everything around it (schema, batch
  * iteration via mapPartitions, partitioning discipline, metadata
  * propagation) is the real production shape: swap `decodeStub` for a
  * JNI/codec call and nothing else changes.
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

  /** DECODE — STUB. A real implementation calls the codec here
    * (per-partition, batched); the fake derives deterministic
    * dimensions from the payload checksum so downstream logic is
    * testable. */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select("id", "media_type", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (id, mt, bytes) =>
          val ck = md5_60(bytes, 0, bytes.length)
          // ??? real codec goes here; fake dims are checksum-derived
          // (ck is non-negative by construction, < 2^60)
          val w = 64 + (ck % 1024).toInt
          val h = 64 + ((ck >> 10) % 1024).toInt
          MediaMeta(id, mt, bytes.length, w, h, ck)
        }
      }
  }

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
