package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.multimodal.{Multimodal, PerceptualAudio, PerceptualHash}
import graft.streaming.EventPipeline

/** Event-stream (batch shape) and multimodal-plumbing inventory.
  * Timestamps in the fixture are µs-precision, so raw ts values and
  * date_trunc results compare exactly against DuckDB.
  */
object EventQueries {

  val all: Seq[Q] = Seq(
    Q(
      "qe01_hourly_window",
      (s, dir) =>
        EventPipeline.windowedAgg(Tables.load(s, dir, "events"), "1 hour"),
      Some("""SELECT date_trunc('hour', ts) AS w_start, event_type,
                     count(*) AS n,
                     CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total_value
              FROM events GROUP BY 1, 2"""),
      bench = true),
    Q(
      "qe02_daily_window",
      (s, dir) =>
        EventPipeline.windowedAgg(Tables.load(s, dir, "events"), "1 day"),
      Some("""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS w_start, event_type,
                     count(*) AS n,
                     CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total_value
              FROM events GROUP BY 1, 2""")),
    Q(
      "qe03_sessionize",
      (s, dir) => EventPipeline.sessionize(Tables.load(s, dir, "events")),
      Some("""WITH g AS (
                SELECT user_id, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR date_diff('second', lag(ts) OVER w, ts) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
              ), s AS (
                SELECT user_id, event_id,
                       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                         AS session_id
                FROM g
              )
              SELECT user_id, session_id, count(*) AS n_events,
                     min(event_id) AS first_event, max(event_id) AS last_event
              FROM s GROUP BY user_id, session_id""")),
    Q(
      "qe06_stateful_sessionize",
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        graft.streaming.StatefulSessions
          .sessionize(Tables.load(s, dir, "events")).toDF()
      },
      // custom-state (flatMapGroupsWithState) implementation must land
      // on the identical session set as the window formulation (qe03)
      Some("""WITH g AS (
                SELECT user_id, event_id,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR date_diff('second', lag(ts) OVER w, ts) > 1800
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
              ), s AS (
                SELECT user_id, event_id,
                       CAST(sum(new_session) OVER (PARTITION BY user_id ORDER BY event_id
                                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                         AS session_id
                FROM g
              )
              SELECT user_id, session_id, count(*) AS n_events,
                     min(event_id) AS first_event, max(event_id) AS last_event
              FROM s GROUP BY user_id, session_id""")),
    Q(
      "qe04_type_stats",
      (s, dir) => EventPipeline.typeStats(Tables.load(s, dir, "events")),
      Some("""SELECT event_type, count(*) AS n,
                     CAST(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS DOUBLE) AS total_value,
                     min(ts) AS first_ts, max(ts) AS last_ts
              FROM events GROUP BY event_type""")),
    Q(
      "qe05_json_extract",
      (s, dir) => EventPipeline.extractProps(Tables.load(s, dir, "events")),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events""")),
    Q(
      "qe07_type_transitions",
      (s, dir) => {
        // behavioral bigrams: per-user (prev event type -> type) counts,
        // the classic session-analysis transition matrix
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("event_id")
        Tables.load(s, dir, "events")
          .select(col("user_id"), col("event_id"), col("event_type"),
            lag("event_type", 1).over(w).as("prev_type"))
          .filter(col("prev_type").isNotNull)
          .groupBy(col("prev_type"), col("event_type").as("next_type"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""SELECT prev_type, event_type AS next_type, count(*) AS n
              FROM (SELECT event_type,
                           lag(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY event_id) AS prev_type
                    FROM events) x
              WHERE prev_type IS NOT NULL
              GROUP BY prev_type, event_type""")),
    Q(
      "qm01_media_bytes",
      (s, dir) => {
        val media = Multimodal.asMedia(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        media.select(
          col("id").as("doc_id"),
          col("media_type"),
          octet_length(col("content")).as("n_bytes"))
      },
      Some("""SELECT doc_id, 'text/plain' AS media_type,
                     octet_length(encode(text)) AS n_bytes
              FROM documents""")),
    Q(
      "qm02_decode_meta",
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val media = Multimodal.asMedia(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        Multimodal.decode(media).toDF()
          .select(col("id").as("doc_id"), col("nBytes").as("n_bytes"),
            col("width"), col("height"), col("checksum"))
      },
      // the stub checksum is an md5 prefix, so the decode metadata is
      // fully value-oracle-able (fixture payloads are the text bytes)
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                     CAST(64 + ck % 1024 AS INT) AS width,
                     CAST(64 + (ck >> 10) % 1024 AS INT) AS height,
                     ck AS checksum
              FROM (SELECT doc_id, text,
                           CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS ck
                    FROM documents) x""")),
    Q(
      "qm04_audio_meta",
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val media = Multimodal.asMedia(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        Multimodal.decodeAudio(media).toDF()
          .select(col("id").as("doc_id"), col("nBytes").as("n_bytes"),
            col("channels"), col("sampleRate").as("sample_rate"),
            col("durationMs").as("duration_ms"), col("checksum"))
      },
      // text payloads take the deterministic stub path (real WAV/FLAC
      // parsing is spec-tested on hand-built containers), so the audio
      // metadata is fully value-oracle-able like qm02
      Some("""SELECT doc_id, octet_length(encode(text)) AS n_bytes,
                     CAST(1 + ck % 2 AS INT) AS channels,
                     CAST(8000 + (ck % 5) * 8000 AS INT) AS sample_rate,
                     (ck >> 10) % 600000 AS duration_ms,
                     ck AS checksum
              FROM (SELECT doc_id, text,
                           CAST(('0x' || substring(md5(text), 1, 15)) AS BIGINT) AS ck
                    FROM documents) x""")),
    Q(
      "qm03_frame_sample",
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val media = Multimodal.asMedia(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        Multimodal.frameSampleStub(media, frameBytes = 64, stride = 2).toDF()
          .select(col("id").as("doc_id"), col("frameIndex").as("frame_index"),
            col("offset"), col("frameChecksum").as("frame_checksum"))
      },
      // frame slices are byte ranges; the fixture text is pure ASCII so
      // DuckDB's character substring addresses the same bytes
      Some("""SELECT doc_id,
                     CAST(f AS INT) AS frame_index,
                     f * 64 AS "offset",
                     CAST(('0x' || substring(md5(substring(text, CAST(f * 64 + 1 AS INT), 64)), 1, 15)) AS BIGINT)
                       AS frame_checksum
              FROM (SELECT doc_id, text,
                           unnest(range(0, greatest(length(text) // 64, 1), 2)) AS f
                    FROM documents) x""")),
    Q(
      "qm05_image_near_dup",
      // perceptual image near-dup: REAL PNG decode (ImageIO) -> 64-bit
      // dHash -> blocked-Hamming pairs. The corpus ships no images, so
      // deterministic 9x8 grayscale PNGs are planted per doc_id
      // in-query (qt16's injection trick): even/odd ids in a pair-group
      // render near-identical pixels. Pixels are a pure function of
      // doc_id, the PNG roundtrip is lossless and the hash path is
      // integer-only, so DuckDB re-derives every value.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = graft.operators.Parallelism.ensureMin(
          Tables.load(s, dir, "documents")
            .select(col("doc_id").cast("long"))).as[Long]
          .mapPartitions(_.map(id =>
            (id, "image/png", PerceptualHash.plantedPng(id))))
          .toDF("id", "media_type", "content")
        PerceptualHash.pairsWithinBlock(
          media, expr("id div 2"), maxHamming = 8)
      },
      Some(PerceptualHash.oracleSql(8))),
    Q(
      "qm06_audio_near_dup",
      // perceptual audio near-dup: REAL WAV PCM16 sample decode ->
      // 65-window loudness envelope -> 64-bit gradient-sign hash ->
      // blocked-Hamming pairs. Planted per-doc WAVs (odd ids are
      // 0.9-gain copies — the re-normalized duplicate the contour
      // catches); integer-only hash path, so DuckDB re-derives every
      // value from the same sample function.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = graft.operators.Parallelism.ensureMin(
          Tables.load(s, dir, "documents")
            .select(col("doc_id").cast("long"))).as[Long]
          .mapPartitions(_.map(id =>
            (id, "audio/wav", PerceptualAudio.plantedWav(id))))
          .toDF("id", "media_type", "content")
        PerceptualAudio.pairsWithinBlock(
          media, expr("id div 2"), maxHamming = 10)
      },
      Some(PerceptualAudio.oracleSql(10))),
    Q(
      "qm07_image_dup_clusters",
      // image pair graph -> duplicate clusters: the qd16 composition
      // applied to the multimodal surface — every doc labeled with the
      // least id reachable through the dHash near-dup graph
      // (singletons label themselves); oracled by an independent
      // recursive transitive closure over the same planted hashes.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id").cast("long"))
        val media = graft.operators.Parallelism.ensureMin(docs).as[Long]
          .mapPartitions(_.map(id =>
            (id, "image/png", PerceptualHash.plantedPng(id))))
          .toDF("id", "media_type", "content")
        val edges = PerceptualHash.pairsWithinBlock(
          media, expr("id div 2"), maxHamming = 8)
        graft.operators.dedup.ConnectedComponents.components(
          edges, "doc_a", "doc_b", docs, "doc_id")
      },
      Some(PerceptualHash.oracleComponentsSql(8))),
    Q(
      "qm08_image_near_dup_unblocked",
      // default dHash-prefix blocking: NO caller blocking column — the
      // 8 bands of the hash itself are the blocks, exact recall for
      // Hamming <= 7 by pigeonhole. The oracle is the brute-force
      // all-pairs Hamming join over the full planted corpus (no group
      // restriction), so the green hash match IS the recall proof
      // against the unblocked formulation.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val media = graft.operators.Parallelism.ensureMin(
          Tables.load(s, dir, "documents")
            .select(col("doc_id").cast("long"))).as[Long]
          .mapPartitions(_.map(id =>
            (id, "image/png", PerceptualHash.plantedPng(id))))
          .toDF("id", "media_type", "content")
        PerceptualHash.pairs(media, maxHamming = 7, bands = 8)
      },
      Some(PerceptualHash.oracleAllPairsSql(7)),
      bench = true),
    Q(
      "qm12_image_canonical",
      // qp04's "which copy do we keep" applied to the image modality:
      // qm07's dHash dup clusters ranked by the attached document's
      // n_chars (keep the image whose doc carries the richest text;
      // id tiebreak) through the same CanonicalSelect window. Oracle
      // nests the image transitive-closure components and evaluates
      // the identical full-frame first_value.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val ids = docs.select(col("doc_id").cast("long"))
        val media = graft.operators.Parallelism.ensureMin(ids).as[Long]
          .mapPartitions(_.map(id =>
            (id, "image/png", PerceptualHash.plantedPng(id))))
          .toDF("id", "media_type", "content")
        val edges = PerceptualHash.pairsWithinBlock(
          media, expr("id div 2"), maxHamming = 8)
        val comp = graft.operators.dedup.ConnectedComponents.components(
          edges, "doc_a", "doc_b", ids, "doc_id")
        graft.operators.dedup.CanonicalSelect.label(
          docs.select(col("doc_id"), col("n_chars")), "doc_id",
          col("n_chars"), comp)
      },
      Some(s"""SELECT doc_id, component,
              |       first_value(doc_id) OVER (
              |         PARTITION BY component ORDER BY n_chars DESC, doc_id ASC
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              |         AS canonical_id,
              |       doc_id = first_value(doc_id) OVER (
              |         PARTITION BY component ORDER BY n_chars DESC, doc_id ASC
              |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              |         AS keep
              |FROM (SELECT c.doc_id, c.component, d.n_chars
              |      FROM (${PerceptualHash.oracleComponentsSql(8)}) c
              |      JOIN documents d USING (doc_id)) x""".stripMargin)),
    Q(
      "qm13_image_in_video",
      // cross-modal containment: indexed images found INSIDE videos —
      // both sides reduce to 64-bit perceptual dHashes through the
      // real PNG decode; the banded Hamming JOIN (qm08's prefix
      // banding generalized to two tables) is pigeonhole-exact for
      // maxHamming < bands, so the oracle is the brute-force cross
      // join. Fixture: videos = docs with id % 4 = 0, frame f carries
      // the planted image (2*video_id + f) — each video "shows" three
      // consecutive planted images.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id").cast("long"))
        val images = graft.operators.Parallelism.ensureMin(ids).as[Long]
          .mapPartitions(_.map(id =>
            (id, "image/png", PerceptualHash.plantedPng(id))))
          .toDF("id", "media_type", "content")
        val frames = graft.operators.Parallelism.ensureMin(
          ids.filter(col("doc_id") % 4 === 0)).as[Long]
          .mapPartitions(_.flatMap(v => (0 until 3).iterator.map(f =>
            (v, f, PerceptualHash.plantedPng(v * 2 + f)))))
          .toDF("video_id", "frame_idx", "content")
        graft.operators.multimodal.ImageInVideo.hits(
          images, frames, maxHamming = 3)
      },
      Some(graft.operators.multimodal.ImageInVideo.oracleSql(3, 3))),
    Q(
      "qm14_audio_in_stream",
      // cross-modal containment, audio leg (qm13's machinery over the
      // gain-invariant loudness-contour hash): indexed clips found
      // inside stream segments through the real WAV PCM16 decode;
      // banded Hamming cross-table join, pigeonhole-exact for
      // maxHamming < bands, oracled by the brute-force cross join.
      // Fixture: streams = docs with id % 4 = 0, segment f carries the
      // planted clip (2*stream_id + f).
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val ids = Tables.load(s, dir, "documents")
          .select(col("doc_id").cast("long"))
        val clips = graft.operators.Parallelism.ensureMin(ids).as[Long]
          .mapPartitions(_.map(id =>
            (id, "audio/wav", PerceptualAudio.plantedWav(id))))
          .toDF("id", "media_type", "content")
        val segments = graft.operators.Parallelism.ensureMin(
          ids.filter(col("doc_id") % 4 === 0)).as[Long]
          .mapPartitions(_.flatMap(v => (0 until 3).iterator.map(f =>
            (v, f, PerceptualAudio.plantedWav(v * 2 + f)))))
          .toDF("stream_id", "seg_idx", "content")
        // production maxBlock default throughout: the round-15 fixture
        // fix gave the planted contour space qm13-like entropy (the
        // g·t·7 + epoch slope terms in PerceptualAudio.plantedSample),
        // so no fixture bucket approaches the cap at any test scale —
        // the capless brute-force oracle is the recall proof (qm08's
        // contract) with no override to reconcile
        graft.operators.multimodal.AudioInStream.hits(
          clips, segments, maxHamming = 3)
      },
      Some(graft.operators.multimodal.AudioInStream.oracleSql(3, 3)),
      // bench since round 15: with the spread fixture and production
      // caps its timing measures the audio containment join, so the
      // bench gains the second cross-modal leg beside qm08
      bench = true),
    Q(
      "qm09_video_copy_pairs",
      // content-based video partial-copy detection: videos sharing
      // >= 2 distinct frame fingerprints (the qm03 frame stream) are
      // copy candidates. Inverted-index shape — narrow (fingerprint,
      // id) postings self-join, |A∩B| as an algebraic count, frame
      // bytes never move; ubiquitous fingerprints (fan-in > 8: black
      // frames, intro cards) capped out of pair mining in code.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val media = graft.operators.multimodal.Multimodal.asMedia(
          Tables.load(s, dir, "documents"), "doc_id", "text")
        graft.operators.multimodal.VideoCopyDetect.pairs(
          graft.operators.multimodal.Multimodal
            .frameSampleStub(media, frameBytes = 64, stride = 2).toDF(),
          col("id"), col("frameChecksum"), minShared = 2, maxDocs = 8)
      },
      Some(graft.operators.multimodal.VideoCopyDetect
        .oracleSql(64, 2, 2, 8))),
    Q(
      "qm11_video_dup_clusters",
      // video copy-pair graph -> duplicate clusters: the qm07/qm10
      // composition completed for the third modality — qm09's
      // shared-frame edges feed connected components.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        val docs = Tables.load(s, dir, "documents")
        val media = graft.operators.multimodal.Multimodal.asMedia(
          docs, "doc_id", "text")
        val edges = graft.operators.multimodal.VideoCopyDetect.pairs(
          graft.operators.multimodal.Multimodal
            .frameSampleStub(media, frameBytes = 64, stride = 2).toDF(),
          col("id"), col("frameChecksum"), minShared = 2, maxDocs = 8)
        graft.operators.dedup.ConnectedComponents.components(
          edges, "doc_a", "doc_b", docs.select("doc_id"), "doc_id")
      },
      Some(graft.operators.multimodal.VideoCopyDetect
        .oracleComponentsSql(64, 2, 2, 8))),
    Q(
      "qm10_audio_dup_clusters",
      // audio pair graph -> duplicate clusters: qm07's composition on
      // the audio surface — contour-hash near-dup edges (qm06's planted
      // WAVs, gain-invariant) feed connected components; every doc
      // labeled with the least id reachable, singletons themselves.
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id").cast("long"))
        val media = graft.operators.Parallelism.ensureMin(docs).as[Long]
          .mapPartitions(_.map(id =>
            (id, "audio/wav", PerceptualAudio.plantedWav(id))))
          .toDF("id", "media_type", "content")
        val edges = PerceptualAudio.pairsWithinBlock(
          media, expr("id div 2"), maxHamming = 10)
        graft.operators.dedup.ConnectedComponents.components(
          edges, "doc_a", "doc_b", docs, "doc_id")
      },
      Some(PerceptualAudio.oracleComponentsSql(10))),
    Q(
      "qe09_trending_types",
      // trending dashboard: per hour window, every event type's count,
      // its delta vs the type's previous ACTIVE hour, and the top-3
      // cut by rank. Two narrow shuffles (hourly rollup, per-type lag)
      // then a windowed rank — the standard streaming-analytics
      // "what's moving" query, batch-formulated over the same rollup
      // streamingHourly maintains incrementally.
      (s, dir) => {
        val c = Tables.load(s, dir, "events")
          .groupBy(
            date_trunc("hour", col("ts")).as("w_start"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val byType = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("w_start")
        val byHour = org.apache.spark.sql.expressions.Window
          .partitionBy("w_start").orderBy(col("n").desc, col("event_type"))
        c.withColumn("delta",
            col("n") - coalesce(lag("n", 1).over(byType), lit(0L)))
          .withColumn("rank", row_number().over(byHour))
          .where(col("rank") <= 3)
      },
      Some("""WITH c AS (
                SELECT date_trunc('hour', ts) AS w_start, event_type,
                       count(*) AS n
                FROM events GROUP BY 1, 2),
              d AS (
                SELECT w_start, event_type, n,
                       n - coalesce(lag(n) OVER (PARTITION BY event_type
                                                 ORDER BY w_start), 0) AS delta,
                       row_number() OVER (PARTITION BY w_start
                                          ORDER BY n DESC, event_type) AS rank
                FROM c)
              SELECT w_start, event_type, n, delta, rank
              FROM d WHERE rank <= 3""")),
    Q(
      "qe10_funnel_conversion",
      // funnel analysis: a view CONVERTS when the same user purchases
      // within the next hour; hourly view volume vs conversion rate.
      // Per-user band join (bounded fan-out per key), one distinct on
      // converted view ids, one hourly rollup — microsecond integer
      // band arithmetic and an exact count ratio, fully value-oracled.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"),
            date_trunc("hour", col("ts")).as("w_start"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), unix_micros(col("ts")).as("ptus"))
        val gap = 3600L * 1000000L
        val converted = views.join(purchases,
            views("user_id") === purchases("user_id") &&
              col("ptus") > col("tus") && col("ptus") <= col("tus") + gap)
          .select(views("event_id")).distinct()
          .withColumn("conv", lit(1L))
        views.join(converted, Seq("event_id"), "left")
          .groupBy("w_start")
          .agg(
            count(lit(1)).as("n_views"),
            count(col("conv")).as("n_conversions"))
          .withColumn("cvr", graft.operators.PortableRound.floorTo(
            col("n_conversions").cast("double") / col("n_views").cast("double"), 4))
      },
      Some("""WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                                date_trunc('hour', ts) AS w_start
                         FROM events WHERE event_type = 'view'),
              p AS (SELECT user_id, epoch_us(ts) AS ptus
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT DISTINCT v.event_id
                    FROM v JOIN p ON v.user_id = p.user_id
                     AND p.ptus > v.tus AND p.ptus <= v.tus + 3600000000)
              SELECT w_start, count(*) AS n_views,
                     count(c.event_id) AS n_conversions,
                     (floor((CAST(count(c.event_id) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0) AS cvr
              FROM v LEFT JOIN c ON v.event_id = c.event_id
              GROUP BY w_start""")),
    Q(
      "qe11_approx_quantiles",
      // approximate percentile sketch — completes the sketch family
      // (HLL qt23 cardinality, bloom qd20 membership, CMS qt27
      // frequency, MinHash qd09 similarity; this one: rank). At 100 TB
      // the exact percentile sorts every group; the KLL-style sketch
      // partial-aggregates map-side. Sketch internals aren't
      // SQL-reproducible, so this is a GATE (qt23 pattern) on the
      // accuracy contract: every per-type p50/p90 estimate within 5%
      // of the exact value computed side by side.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        ev.groupBy("event_type")
          .agg(
            expr("percentile(value, 0.5D)").as("ex50"),
            expr("percentile(value, 0.9D)").as("ex90"),
            expr("approx_percentile(value, 0.5D, 1000)").as("ap50"),
            expr("approx_percentile(value, 0.9D, 1000)").as("ap90"))
          .agg(
            (max(abs(col("ap50") - col("ex50")) / abs(col("ex50"))) <= 0.05)
              .as("p50_bounded"),
            (max(abs(col("ap90") - col("ex90")) / abs(col("ex90"))) <= 0.05)
              .as("p90_bounded"),
            (count(lit(1)) === 5).as("all_types_present"))
      },
      Some("SELECT true AS p50_bounded, true AS p90_bounded, " +
        "true AS all_types_present")),
    Q(
      "qe08_value_outliers",
      // robust per-type outlier profile: exact quartiles + Tukey-fence
      // count. Quantile interpolation and the fence arithmetic keep
      // identical operation order on both engines (bit-exact doubles);
      // zero-outlier groups survive via the left join
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        // tiny (one row per type) but referenced twice below — pin it so
        // the exact-percentile aggregation over events runs once, not
        // once per reference (broadcast exchanges don't dedupe against
        // plain aggregates)
        val stats = ev.groupBy("event_type").agg(
          expr("percentile(value, 0.5D)").as("med"),
          expr("percentile(value, 0.25D)").as("p25"),
          expr("percentile(value, 0.75D)").as("p75"))
          .localCheckpoint(true)
        val outliers = ev
          .join(broadcast(stats), "event_type")
          .where(abs(col("value") - col("med")) >
            (col("p75") - col("p25")) * lit(1.5))
          .groupBy("event_type")
          .agg(count(lit(1)).as("n_outliers"))
        stats.join(outliers, Seq("event_type"), "left")
          .select(col("event_type"), col("med"), col("p25"), col("p75"),
            coalesce(col("n_outliers"), lit(0L)).as("n_outliers"))
      },
      Some("""WITH s AS (
                SELECT event_type,
                       quantile_cont(value, 0.5) AS med,
                       quantile_cont(value, 0.25) AS p25,
                       quantile_cont(value, 0.75) AS p75
                FROM events GROUP BY event_type),
              o AS (
                SELECT e.event_type, count(*) AS n_outliers
                FROM events e JOIN s ON e.event_type = s.event_type
                WHERE abs(e.value - s.med) > (s.p75 - s.p25) * 1.5
                GROUP BY e.event_type)
              SELECT s.event_type, med, p25, p75,
                     coalesce(n_outliers, 0) AS n_outliers
              FROM s LEFT JOIN o ON s.event_type = o.event_type""")),
    Q(
      "qe13_interevent_gaps",
      // inter-arrival profile per event type: percentiles of the gap
      // between consecutive same-user events — the signal behind rate
      // limiting, bot detection and session-gap tuning. One per-user
      // window (lag over the same sort sessionization pays), then the
      // qt34 percentile contract (both engines linear-interpolate).
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("tus")
        ev.select(col("user_id"), col("event_type"),
            unix_micros(col("ts")).as("tus"))
          .withColumn("gap_us",
            (col("tus") - lag("tus", 1).over(w)).cast("double"))
          .filter(col("gap_us").isNotNull)
          .groupBy("event_type")
          .agg(
            count(lit(1)).as("n_gaps"),
            expr("percentile(gap_us, 0.5D)").as("p50_us"),
            expr("percentile(gap_us, 0.9D)").as("p90_us"),
            max(col("gap_us").cast("long")).as("max_us"))
      },
      Some("""WITH g AS (
                SELECT event_type,
                       CAST(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                         PARTITION BY user_id ORDER BY epoch_us(ts)) AS DOUBLE)
                         AS gap_us
                FROM events)
              SELECT event_type, count(*) AS n_gaps,
                     quantile_cont(gap_us, 0.5) AS p50_us,
                     quantile_cont(gap_us, 0.9) AS p90_us,
                     CAST(max(gap_us) AS BIGINT) AS max_us
              FROM g WHERE gap_us IS NOT NULL
              GROUP BY event_type""")),
    Q(
      "qe12_retention_cohorts",
      // classic cohort retention: users bucketed by their FIRST active
      // week, then each cohort's share still active N weeks later.
      // Weeks are integer epoch-µs floor-divisions (positive epochs,
      // exact), counts are distinct users, retention one BIGINT→DOUBLE
      // division — fully value-oracled. Shape: two aggregates over a
      // narrow (user, week) distinct + one user-keyed join; no event
      // self-join, nothing quadratic.
      (s, dir) => {
        val weekUs = 7L * 86400L * 1000000L
        val ev = Tables.load(s, dir, "events")
        val weeks = ev.select(
          col("user_id"),
          floor(unix_micros(col("ts")) / lit(weekUs)).cast("long").as("wk"))
          .distinct()
        val cohort = weeks.groupBy("user_id").agg(min("wk").as("cohort_wk"))
        val sizes = cohort.groupBy("cohort_wk")
          .agg(count(lit(1)).as("n_cohort"))
        weeks.join(cohort, "user_id")
          .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
          .agg(count(lit(1)).as("n_active"))
          .join(sizes, "cohort_wk")
          .select(
            col("cohort_wk"), col("week_offset"), col("n_active"), col("n_cohort"),
            (col("n_active").cast("double") / col("n_cohort").cast("double"))
              .as("retention"))
      },
      Some("""WITH weeks AS (
                SELECT DISTINCT user_id,
                       CAST(floor(epoch_us(ts) / 604800000000) AS BIGINT) AS wk
                FROM events),
              cohort AS (
                SELECT user_id, min(wk) AS cohort_wk FROM weeks GROUP BY user_id),
              sizes AS (
                SELECT cohort_wk, count(*) AS n_cohort FROM cohort GROUP BY cohort_wk),
              act AS (
                SELECT c.cohort_wk, w.wk - c.cohort_wk AS week_offset,
                       count(*) AS n_active
                FROM weeks w JOIN cohort c ON w.user_id = c.user_id
                GROUP BY 1, 2)
              SELECT a.cohort_wk, a.week_offset, a.n_active, s.n_cohort,
                     CAST(a.n_active AS DOUBLE) / CAST(s.n_cohort AS DOUBLE)
                       AS retention
              FROM act a JOIN sizes s ON a.cohort_wk = s.cohort_wk""")),
    Q(
      "qe14_histogram_quantiles",
      // engine-portable mergeable quantile histogram (decimal
      // HdrHistogram): qe11 can only rows-check Spark's built-in
      // approx sketch; this one VALUE-oracles the whole estimator —
      // string-arithmetic decimal buckets, integer per-mille ranks,
      // and the structural 10^(1-p) error bound checked against the
      // exact discrete quantile (itself domain-bounded integer math).
      (s, dir) =>
        graft.operators.PortableHistogram.quantileProfile(
          Tables.load(s, dir, "events"), col("value"), p = 3,
          qsPerMille = Seq(500, 900, 990, 999)),
      Some(graft.operators.PortableHistogram
        .oracleQuantileSql(3, Seq(500, 900, 990, 999)))),
    Q(
      "qe15_histogram_merge",
      // the property that makes qe14 a 100 TB sketch: shard histograms
      // merge by bucket-wise ADDITION with zero loss. Derived end to
      // end — rows split into two md5 half-streams, each sketched
      // independently, merged, and compared bucket-for-bucket against
      // the whole-stream sketch (qt49's sibling for quantiles).
      (s, dir) =>
        graft.operators.PortableHistogram.mergeProfile(
          Tables.load(s, dir, "events"), col("value"), col("event_id"),
          p = 3),
      Some(graft.operators.PortableHistogram.oracleMergeSql(3))),
    Q(
      "qe16_hourly_quantiles",
      // qe14 per event-hour: the latency-dashboard shape. Every
      // window PARTITIONS BY HOUR, so nothing is single-task at any
      // group count — each hour's cumulative walk runs over its own
      // domain-bounded bucket set (estimates only; qe14 carries the
      // exact-quantile verification leg).
      (s, dir) =>
        graft.operators.PortableHistogram.groupedQuantiles(
            Tables.load(s, dir, "events"), col("value"),
            groups = Seq(
              floor(unix_micros(col("ts")) / lit(3600000000.0)).cast("long")),
            p = 3, qsPerMille = Seq(500, 990))
          .withColumnRenamed("g0", "hr"),
      Some(graft.operators.PortableHistogram
        .oracleHourlyQuantileSql(3, Seq(500, 990)))),
    Q(
      "qe17_conversion_latency",
      // the funnel's TIME dimension: per-purchase latency since the
      // user's most recent prior view (qj01's as-of attribution) fed
      // through the portable quantile histogram -- "p50/p99 time to
      // convert", with the exact-quantile error gate. Two verified
      // operators composed under one oracle.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        val purchases = ev.filter(col("event_type") === "purchase")
          .select("user_id", "event_id", "ts")
        val views = ev.filter(col("event_type") === "view")
          .select("user_id", "event_id", "ts")
        val attributed = graft.operators.AsOfJoin.asofBackward(
            purchases, views, Seq("user_id"), "event_id",
            rightPrefix = "prev_", strict = true)
          .where(col("prev_ts").isNotNull)
          .select(((unix_micros(col("ts")) - unix_micros(col("prev_ts")))
            .cast("double") / lit(1e6)).as("latency_secs"))
          // forward conversions only — the event_id as-of key tracks
          // ts on this fixture, but the latency contract should not
          // depend on that coupling
          .where(col("latency_secs") >= 0)
        graft.operators.PortableHistogram.quantileProfile(
          attributed, col("latency_secs"), p = 3,
          qsPerMille = Seq(500, 900, 990))
      },
      Some(graft.operators.PortableHistogram.oracleQuantileSqlFrom(
        "CAST(epoch_us(ts) - epoch_us(prev_ts) AS DOUBLE) / 1000000.0",
        """(WITH base AS MATERIALIZED (
          |     SELECT l.ts, r.ts AS prev_ts
          |     FROM (SELECT * FROM events WHERE event_type = 'purchase') l
          |     ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') r
          |       ON l.user_id = r.user_id AND r.event_id < l.event_id)
          |   -- MATERIALIZED blocks DuckDB from pushing this filter
          |   -- into the ASOF join as a second (rejected) inequality
          |   SELECT * FROM base WHERE epoch_us(ts) >= epoch_us(prev_ts)) lat""".stripMargin,
        3, Seq(500, 900, 990))))
    ,
    Q(
      "qe18_key_skew",
      // the pre-join planning probe: top-10 hottest user_ids with
      // share, heat-vs-average, and the salt fan-out that bounds a
      // shuffle task at 50 rows/key (50 so fixture-scale salts
      // exercise > 1) — one scan, one map-combined count shuffle, a
      // 1-row broadcast back, TakeOrdered cut; all-BIGINT arithmetic
      (s, dir) => graft.operators.SkewReport.report(
        graft.Tables.load(s, dir, "events"), col("user_id"),
        topK = 10, targetPerTask = 50L),
      Some(graft.operators.SkewReport.oracleSql(
        "events", "user_id", topK = 10, targetPerTask = 50L))),

    Q(
      "qe19_rate_anomaly",
      // the monitoring alert primitive qe09's deltas approximate:
      // per-type hourly counts z-scored against the TRAILING 24
      // active hours (integer window sums n/s/ss; the z is one float
      // expression with identical operation order in both engines,
      // floor-projected) — spikes and droughts alike; needs >= 6
      // hours of history, zero trailing variance emits NULL (the
      // identical <= 0 guard branches the same IEEE value in both
      // engines)
      (s, dir) => {
        // a NULL ts carries no rate signal and would order NULLS
        // FIRST in Spark vs NULLS LAST in DuckDB (review finding) —
        // exclude it from the hourly stream on both sides
        val c = Tables.load(s, dir, "events")
          .where(col("ts").isNotNull)
          .groupBy(date_trunc("hour", col("ts")).as("hr"),
            col("event_type"))
          .agg(count(lit(1)).as("n"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type").orderBy("hr").rowsBetween(-24, -1)
        val mean = col("s").cast("double") / col("m").cast("double")
        val variance = col("ss").cast("double") / col("m").cast("double") -
          mean * mean
        c.withColumn("m", count(lit(1)).over(w))
          .withColumn("s", sum("n").over(w))
          .withColumn("ss", sum(col("n") * col("n")).over(w))
          .where(col("m") >= 6L)
          .select(col("hr"), col("event_type"), col("n"),
            col("m").cast("bigint").as("m"),
            when(variance <= 0.0, lit(null).cast("double"))
              .otherwise(graft.operators.PortableRound.floorTo(
                (col("n").cast("double") - mean) / sqrt(variance), 3))
              .as("z_milli"))
      },
      Some {
        val mean = "(CAST(s AS DOUBLE) / CAST(m AS DOUBLE))"
        val variance = s"CAST(ss AS DOUBLE) / CAST(m AS DOUBLE) - $mean * $mean"
        s"""WITH c AS (
           |  SELECT date_trunc('hour', ts) AS hr, event_type,
           |         count(*)::BIGINT AS n
           |  FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
           |wdw AS (
           |  SELECT hr, event_type, n,
           |         count(*) OVER tw AS m,
           |         sum(n) OVER tw AS s,
           |         sum(n * n) OVER tw AS ss
           |  FROM c
           |  WINDOW tw AS (PARTITION BY event_type ORDER BY hr
           |                ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
           |SELECT hr, event_type, n, CAST(m AS BIGINT) AS m,
           |       CASE WHEN ($variance) <= 0.0 THEN NULL
           |            ELSE ${graft.operators.PortableRound.floorToSql(
            s"(CAST(n AS DOUBLE) - $mean) / sqrt($variance)", 3)}
           |       END AS z_milli
           |FROM wdw WHERE m >= 6""".stripMargin
      }),

    Q(
      "qe20_stateful_funnel",
      // qe10's funnel as CUSTOM STATE (the qe06/qe03 twin pattern for
      // the conversion join): per-user open-view buffers settled by
      // each purchase arrival — the formulation that works when
      // purchases arrive micro-batches after their views; batch mode
      // must roll up to qe10's exact hourly table, so it runs under
      // qe10's own oracle (an INDEPENDENT join formulation)
      (s, dir) => {
        implicit val sp: org.apache.spark.sql.SparkSession = s
        graft.streaming.StatefulFunnel.funnel(Tables.load(s, dir, "events"))
          .toDF()
          .withColumn("w_start",
            date_trunc("hour", timestamp_micros(col("tus"))))
          .groupBy("w_start")
          .agg(
            count(lit(1)).as("n_views"),
            sum(when(col("converted"), 1L).otherwise(0L))
              .cast("bigint").as("n_conversions"))
          .withColumn("cvr", graft.operators.PortableRound.floorTo(
            col("n_conversions").cast("double") / col("n_views").cast("double"),
            4))
      },
      Some("""WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                                date_trunc('hour', ts) AS w_start
                         FROM events WHERE event_type = 'view'),
              p AS (SELECT user_id, epoch_us(ts) AS ptus
                    FROM events WHERE event_type = 'purchase'),
              c AS (SELECT DISTINCT v.event_id
                    FROM v JOIN p ON v.user_id = p.user_id
                     AND p.ptus > v.tus AND p.ptus <= v.tus + 3600000000)
              SELECT w_start, count(*) AS n_views,
                     count(c.event_id) AS n_conversions,
                     (floor((CAST(count(c.event_id) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0) AS cvr
              FROM v LEFT JOIN c ON v.event_id = c.event_id
              GROUP BY w_start""")),

    Q(
      "qe21_path_ngrams",
      // session path mining: the top 20 length-3 event-type sequences
      // walked inside one session (qe03's session derivation; lead-
      // composed n-grams, no explode; algebraic count over the tiny
      // |types|^3 path domain; TakeOrdered cut with path tiebreak)
      (s, dir) => graft.streaming.EventPipeline.pathNgrams(
        Tables.load(s, dir, "events"), n = 3, k = 20),
      Some("""WITH g AS (
                SELECT user_id, event_id, event_type,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR date_diff('second', lag(ts) OVER w, ts) > 1800
                            THEN 1 ELSE 0 END AS ns
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
              s AS (
                SELECT user_id, event_id, event_type,
                       sum(ns) OVER (PARTITION BY user_id ORDER BY event_id
                                     ROWS UNBOUNDED PRECEDING) AS session_id
                FROM g),
              t AS (
                SELECT event_type,
                       lead(event_type, 1) OVER w2 AS t1,
                       lead(event_type, 2) OVER w2 AS t2
                FROM s
                WINDOW w2 AS (PARTITION BY user_id, session_id ORDER BY event_id))
              SELECT event_type || '>' || t1 || '>' || t2 AS path,
                     count(*)::BIGINT AS n
              FROM t WHERE t2 IS NOT NULL
              GROUP BY 1 ORDER BY n DESC, path LIMIT 20""")),

    Q(
      "qe22_staged_funnel",
      // THREE-stage funnel (qe10 is two): view → first click within 30
      // min → first purchase within 60 min OF THE CLICK, hourly
      // rollup. Each stage is one forward-within as-of (one shuffle on
      // user_id, union + sort + forward frame — never a range join);
      // the oracle chains DuckDB's native forward ASOF twice. Rates
      // are floor-milli; stage columns are ord-derived, tie-proof.
      (s, dir) => {
        val ev = Tables.load(s, dir, "events")
        def side(t: String) = ev.filter(col("event_type") === t)
          .select(col("user_id"), unix_micros(col("ts")).as("tus"))
        val views = ev.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("tus"),
            date_trunc("hour", col("ts")).as("w_start"))
        val s2 = graft.operators.AsOfJoin.asofForwardWithin(
          views, side("click"), Seq("user_id"), "tus",
          maxGap = 1800L * 1000000L, rightPrefix = "c_")
        val s3 = graft.operators.AsOfJoin.asofForwardWithin(
          s2.select(col("user_id"), col("event_id"), col("w_start"),
            col("c_tus").as("tus")),
          side("purchase"), Seq("user_id"), "tus",
          maxGap = 3600L * 1000000L, rightPrefix = "p_")
        s3.groupBy("w_start")
          .agg(
            count(lit(1)).as("n_views"),
            count(col("tus")).as("n_clicked"),
            count(col("p_tus")).as("n_purchased"))
          .withColumn("click_rate", graft.operators.PortableRound.floorTo(
            col("n_clicked").cast("double") / col("n_views").cast("double"), 4))
          .withColumn("purchase_rate", graft.operators.PortableRound.floorTo(
            col("n_purchased").cast("double") / col("n_views").cast("double"), 4))
      },
      Some("""WITH v AS (SELECT user_id, event_id, epoch_us(ts) AS tus,
                                date_trunc('hour', ts) AS w_start
                         FROM events WHERE event_type = 'view'),
              c AS (SELECT user_id, epoch_us(ts) AS tus
                    FROM events WHERE event_type = 'click'),
              p AS (SELECT user_id, epoch_us(ts) AS tus
                    FROM events WHERE event_type = 'purchase'),
              s2 AS (SELECT v.user_id, v.event_id, v.w_start,
                            CASE WHEN c.tus - v.tus <= 1800000000 THEN c.tus END
                              AS ctus
                     FROM v ASOF LEFT JOIN c
                       ON v.user_id = c.user_id AND v.tus < c.tus),
              s3 AS (SELECT s2.*,
                            CASE WHEN p.tus - s2.ctus <= 3600000000 THEN p.tus END
                              AS ptus
                     FROM s2 ASOF LEFT JOIN p
                       ON s2.user_id = p.user_id AND s2.ctus < p.tus)
              SELECT w_start, count(*) AS n_views,
                     count(ctus) AS n_clicked, count(ptus) AS n_purchased,
                     (floor((CAST(count(ctus) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0)
                       AS click_rate,
                     (floor((CAST(count(ptus) AS DOUBLE)
                           / CAST(count(*) AS DOUBLE)) * 10000.0) / 10000.0)
                       AS purchase_rate
              FROM s3 GROUP BY w_start"""))
  )
}
