package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cross-modal containment, audio leg (the [[ImageInVideo]] machinery
  * over loudness-contour hashes): find INDEXED AUDIO CLIPS appearing
  * inside longer streams' sampled segments — the "is this jingle /
  * sample used in any of these recordings" provenance probe, and
  * cross-modal dedup for AV corpora (a training clip that is also a
  * segment of a training stream is the same content twice). Both
  * sides reduce to the 64-bit gain-invariant contour hash
  * ([[PerceptualAudio.audioHash64]], real WAV PCM16 decode); the join
  * is the shared banded Hamming cross-table join —
  * pigeonhole-exact for maxHamming < bands, so the qm14 oracle is the
  * brute-force cross join. Same 100 TB shape as qm13: payload bytes
  * never enter the join, one decode pass per side behind the Barrier,
  * buckets hot on either side capped.
  */
object AudioInStream {

  /** @param clips media frame (id, content) — decoded through the real
    *              WAV path
    * @param segments (stream_id, seg_idx, content) sampled segments
    * @return (clip_id, stream_id, n_segments, best_hamming) */
  def hits(
      clips: DataFrame,
      segments: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      maxDecodeBytes: Int = 1 << 22,
      maxBlock: Int = PerceptualHash.DefaultMaxBlock)(
      implicit spark: SparkSession): DataFrame = {
    val ch = PerceptualAudio.audioHashes(clips, maxDecodeBytes)
      .withColumnRenamed("id", "image_id")
    ImageInVideo.joinHashed(ch, segmentHashes(segments, maxDecodeBytes),
        maxHamming, bands, maxBlock)
      .select(
        col("image_id").as("clip_id"), col("video_id").as("stream_id"),
        col("n_frames").as("n_segments"), col("best_hamming"))
  }

  /** The segments side reduced to contour hashes — one decode pass
    * (columns renamed to the shared joinHashed convention). */
  private def segmentHashes(
      segments: DataFrame, maxDecodeBytes: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.operators.Parallelism.ensureMin(segments)
      .select(col("stream_id"), col("seg_idx"), col("content"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (sid, i, b) =>
        (sid, i, PerceptualAudio.audioHash64(b, maxDecodeBytes))
      })
      .toDF("video_id", "frame_idx", "dhash")
  }

  /** [[hits]] against a persisted audio-mode
    * [[graft.streaming.MediaIngest]] index (contour hashes in
    * `dir/hashes`): the clip corpus is never re-decoded; only the
    * probe segments pay a decode pass. The productized face of qm14
    * (`media contain` on an `--audio` index). */
  def hitsIndexed(
      spark: SparkSession,
      indexDir: String,
      segments: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      maxDecodeBytes: Int = 1 << 22,
      maxBlock: Int = PerceptualHash.DefaultMaxBlock): DataFrame = {
    implicit val sp: SparkSession = spark
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"exact recall needs maxHamming < bands (got $maxHamming >= $bands)")
    val ch = spark.read.parquet(s"$indexDir/hashes")
      .select(col("id").as("image_id"), col("dhash"))
    ImageInVideo.joinHashed(ch, segmentHashes(segments, maxDecodeBytes),
        maxHamming, bands, maxBlock)
      .select(
        col("image_id").as("clip_id"), col("video_id").as("stream_id"),
        col("n_frames").as("n_segments"), col("best_hamming"))
  }

  /** DuckDB rendition of qm14 over the planted-WAV fixture: clips =
    * every doc's planted contour hash; streams = docs with id % 4 = 0,
    * segment f carrying the audio of planted clip (stream_id * 2 + f).
    * Brute-force cross join — pigeonhole makes the banded join exactly
    * equal for maxHamming < bands. */
  def oracleSql(maxHamming: Int, segmentsPerStream: Int): String =
    s"""WITH ch AS (
       |  SELECT doc_id AS clip_id, ${PerceptualAudio.ahExprSql("doc_id")} AS dh
       |  FROM documents),
       |sf AS (
       |  SELECT d.doc_id AS stream_id, f.f AS seg_idx,
       |         d.doc_id * 2 + f.f AS eq
       |  FROM documents d, (SELECT unnest(range(0, $segmentsPerStream)) AS f) f
       |  WHERE d.doc_id % 4 = 0),
       |sh AS (SELECT stream_id, seg_idx, ${PerceptualAudio.ahExprSql("eq")} AS dh
       |       FROM sf),
       |m AS (SELECT c.clip_id, s.stream_id, s.seg_idx,
       |             bit_count(xor(c.dh, s.dh)) AS h
       |      FROM ch c JOIN sh s ON bit_count(xor(c.dh, s.dh)) <= $maxHamming)
       |SELECT clip_id, stream_id, count(*)::BIGINT AS n_segments,
       |       CAST(min(h) AS INT) AS best_hamming
       |FROM m GROUP BY clip_id, stream_id""".stripMargin
}
