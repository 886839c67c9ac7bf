package graft.operators.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Barrier

/** Cross-modal containment: find INDEXED IMAGES appearing inside
  * VIDEOS — the "is this picture used in any of these clips" probe a
  * media pipeline needs for licensing/provenance audits and for
  * cross-modal dedup (a training image that is also a frame of a
  * training video is the same content twice). Images and sampled
  * video frames both reduce to 64-bit perceptual dHashes
  * ([[PerceptualHash]]); containment is a banded Hamming JOIN between
  * the two hash tables — the first cross-TABLE instance of the
  * qm08 prefix-banding (its self-join generalized to two sides).
  *
  * Exact recall: any pair within Hamming h <= bands-1 agrees on at
  * least one whole band (pigeonhole), so for maxHamming < bands the
  * banded join returns EXACTLY the brute-force cross join's matches —
  * which is what the DuckDB oracle computes (qm13's green hash match
  * is the recall proof).
  *
  * 100 TB shape: payload bytes never enter the join — each side
  * collapses to (band, 16-bit key, id, 8-byte hash) postings after
  * its one decode pass (Barrier'd: two band explosions must not
  * re-decode). The frames side is fps x duration x videos rows but
  * ids+hashes only; buckets hot on EITHER side beyond `maxBlock` are
  * dropped before the join (degenerate floods: black frames, intro
  * cards — exact-dedup fodder, not containment work), bounding the
  * pair expansion at (#buckets) * maxBlock^2. Matches collapse to one
  * row per (image, video) via an algebraic count + min.
  */
object ImageInVideo {

  /** @param images media frame (id, content) — [[Multimodal.asMedia]]
    *               schema; decoded through the real container path
    * @param frames (video_id, frame_idx, content) sampled frames
    * @return (image_id, video_id, n_frames, best_hamming): videos
    *         containing each image, with the match depth */
  def hits(
      images: DataFrame,
      frames: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      maxDecodeBytes: Int = 1 << 22,
      maxBlock: Int = PerceptualHash.DefaultMaxBlock)(
      implicit spark: SparkSession): DataFrame = {
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"exact recall needs maxHamming < bands (got $maxHamming >= $bands)")
    val ih = PerceptualHash.dHashes(images, maxDecodeBytes)
      .withColumnRenamed("id", "image_id")
    joinHashed(ih, frameHashes(frames, maxDecodeBytes), maxHamming, bands,
      maxBlock)
  }

  /** The frames side reduced to (video_id, frame_idx, dhash) — one
    * decode pass. */
  private[multimodal] def frameHashes(
      frames: DataFrame, maxDecodeBytes: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.operators.Parallelism.ensureMin(frames)
      .select(col("video_id"), col("frame_idx"), col("content"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions(_.map { case (v, f, b) =>
        (v, f, PerceptualHash.dHash64(b, maxDecodeBytes))
      })
      .toDF("video_id", "frame_idx", "dhash")
  }

  /** [[hits]] against a persisted [[graft.streaming.MediaIngest]]
    * admission index: the images side is ALREADY hashed (`dir/hashes`,
    * 16 bytes a row — the corpus payloads are never re-decoded), so
    * only the probe frames pay a decode pass. The productized face of
    * qm13 (`media contain`): report every indexed image appearing
    * inside the given video frame table. */
  def hitsIndexed(
      spark: SparkSession,
      indexDir: String,
      frames: DataFrame,
      maxHamming: Int,
      bands: Int = 4,
      maxDecodeBytes: Int = 1 << 22,
      maxBlock: Int = PerceptualHash.DefaultMaxBlock): DataFrame = {
    implicit val sp: SparkSession = spark
    require(64 % bands == 0, "bands must divide 64")
    require(maxHamming < bands,
      s"exact recall needs maxHamming < bands (got $maxHamming >= $bands)")
    val ih = spark.read.parquet(s"$indexDir/hashes")
      .select(col("id").as("image_id"), col("dhash"))
    joinHashed(ih, frameHashes(frames, maxDecodeBytes), maxHamming, bands,
      maxBlock)
  }

  /** The banded cross-table Hamming join over already-derived hashes
    * — split out so specs can feed synthetic hash tables directly. */
  private[multimodal] def joinHashed(
      imageHashes: DataFrame, frameHashes: DataFrame,
      maxHamming: Int, bands: Int, maxBlock: Int): DataFrame = {
    val width = 64 / bands
    val mask = if (width == 64) -1L else (1L << width) - 1
    def banded(df: DataFrame) = df
      .filter(col("dhash").isNotNull)
      .transform(Barrier.apply)
      .select(
        df.columns.map(col) :+
          posexplode(array((0 until bands).map(i =>
            shiftrightunsigned(col("dhash"), i * width).bitwiseAND(lit(mask))): _*))
            .as(Seq("band", "bkey")): _*)
    val ib = banded(imageHashes)
      .select(col("band"), col("bkey"), col("image_id"), col("dhash").as("idh"))
    val fb = banded(frameHashes)
      .select(col("band"), col("bkey"), col("video_id"), col("frame_idx"),
        col("dhash").as("fdh"))
    // a bucket hot on EITHER side blows up the cross product — drop it
    // whole (the overflow key list is tiny, it broadcasts)
    val big = ib.groupBy("band", "bkey").count().filter(col("count") > maxBlock)
      .select("band", "bkey")
      .unionByName(
        fb.groupBy("band", "bkey").count().filter(col("count") > maxBlock)
          .select("band", "bkey"))
      .distinct()
    ib.join(broadcast(big), Seq("band", "bkey"), "left_anti")
      .join(fb.join(broadcast(big), Seq("band", "bkey"), "left_anti"),
        Seq("band", "bkey"))
      .withColumn("hamming",
        bit_count(col("idh").bitwiseXOR(col("fdh"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      // the same (image, frame) match surfaces once per agreeing band
      .dropDuplicates("image_id", "video_id", "frame_idx")
      .groupBy("image_id", "video_id")
      .agg(count(lit(1)).as("n_frames"), min("hamming").as("best_hamming"))
  }

  /** DuckDB rendition of qm13 over the planted-PNG fixture: images =
    * every doc's planted hash; videos = docs with id % 4 = 0, frame f
    * (f < `framesPerVideo`) carrying the pixels of planted image
    * (video_id * 2 + f). The oracle is the BRUTE-FORCE cross join —
    * pigeonhole makes the banded join exactly equal for
    * maxHamming < bands. */
  def oracleSql(maxHamming: Int, framesPerVideo: Int): String =
    s"""WITH ih AS (
       |  SELECT doc_id AS image_id, ${PerceptualHash.dhExprSql("doc_id")} AS dh
       |  FROM documents),
       |vf AS (
       |  SELECT d.doc_id AS video_id, f.f AS frame_idx,
       |         d.doc_id * 2 + f.f AS eq
       |  FROM documents d, (SELECT unnest(range(0, $framesPerVideo)) AS f) f
       |  WHERE d.doc_id % 4 = 0),
       |fh AS (SELECT video_id, frame_idx, ${PerceptualHash.dhExprSql("eq")} AS dh
       |       FROM vf),
       |m AS (SELECT i.image_id, f.video_id, f.frame_idx,
       |             bit_count(xor(i.dh, f.dh)) AS h
       |      FROM ih i JOIN fh f ON bit_count(xor(i.dh, f.dh)) <= $maxHamming)
       |SELECT image_id, video_id, count(*)::BIGINT AS n_frames,
       |       CAST(min(h) AS INT) AS best_hamming
       |FROM m GROUP BY image_id, video_id""".stripMargin
}
