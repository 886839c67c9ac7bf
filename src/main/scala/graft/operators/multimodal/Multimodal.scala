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

  private def fnv(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until && i < bytes.length) {
      h ^= (bytes(i) & 0xffL); h *= 0x100000001b3L; i += 1
    }
    h
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
          val ck = fnv(bytes, 0, bytes.length)
          // ??? real codec goes here; fake dims are checksum-derived
          val w = 64 + (math.abs(ck) % 1024).toInt
          val h = 64 + (math.abs(ck >> 10) % 1024).toInt
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
          Frame(id, f, off, fnv(bytes, off.toInt, off.toInt + frameBytes))
        }
      }
  }
}
