package graft.operators.multimodal

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.Barrier

/** Content-based video partial-copy detection: two videos are copy
  * candidates when they share at least `minShared` DISTINCT frame
  * fingerprints — re-encoded, trimmed or re-ordered copies keep most
  * frame content even when container bytes and duration differ. Runs
  * over any (video id, frame fingerprint) stream:
  * [[Multimodal.frameSampleStub]] today, a real keyframe decoder when
  * codecs exist — the detection layer is codec-agnostic by design.
  * (No reference analog — the reference ships video BLOBs byte-opaque,
  * mysqlDataSyncTool cmd/root.go:423-424.)
  *
  * Scale shape: the inverted-index set-similarity join
  * ([[graft.operators.dedup.NGramJaccard]]'s shape) — postings of
  * narrow (fingerprint, id) rows self-join on fingerprint equality and
  * |A∩B| arrives as an algebraic count; frame bytes never move, and
  * the (id, fingerprint) DISTINCT gives one vote per video without a
  * hot video key. Ubiquitous fingerprints (black frames, intro cards —
  * every crawl has them) are capped IN CODE: a fingerprint in more
  * than `maxDocs` videos is excluded from pair mining (its pair
  * contribution is quadratic in its fan-in and its evidentiary value
  * is nil), mirroring `MinHashLSH.maxBucket` and siblings.
  */
object VideoCopyDetect {

  /** (doc_a, doc_b, shared_frames) with doc_a < doc_b and
    * shared_frames >= minShared, over cold (fan-in <= maxDocs)
    * fingerprints only. */
  def pairs(
      frames: DataFrame,
      id: Column,
      checksum: Column,
      minShared: Int,
      maxDocs: Int): DataFrame = {
    require(minShared >= 1, s"bad minShared $minShared")
    require(maxDocs >= 2, s"maxDocs $maxDocs cannot form a pair")
    val d = frames.select(id.as("id"), checksum.as("fc"))
      .distinct()
      .transform(Barrier.apply)
    // hot list is tiny by construction (only fingerprints over the cap)
    val hot = d.groupBy("fc").agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxDocs)
      .select("fc")
    val cold = d.join(broadcast(hot), Seq("fc"), "left_anti")
    val a = cold.select(col("fc"), col("id").as("doc_a"))
    val b = cold.select(col("fc"), col("id").as("doc_b"))
    a.join(b, Seq("fc"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("shared_frames"))
      .filter(col("shared_frames") >= minShared)
  }

  private def pairCtes(frameBytes: Int, stride: Int, minShared: Int, maxDocs: Int): String =
    s"""f AS (
       |  SELECT doc_id,
       |         CAST(('0x' || substring(md5(substring(text, CAST(fr * $frameBytes + 1 AS INT), $frameBytes)), 1, 15)) AS BIGINT) AS fc
       |  FROM (SELECT doc_id, text,
       |               unnest(range(0, greatest(length(text) // $frameBytes, 1), $stride)) AS fr
       |        FROM documents) x),
       |d AS (SELECT DISTINCT doc_id, fc FROM f),
       |cold AS (
       |  SELECT doc_id, fc FROM d
       |  WHERE fc IN (SELECT fc FROM d GROUP BY fc HAVING count(*) <= $maxDocs)),
       |vp AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared_frames
       |  FROM cold a JOIN cold b ON a.fc = b.fc AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |  HAVING count(*) >= $minShared)""".stripMargin

  /** qm09 oracle: DuckDB re-derives the qm03 frame fingerprints from
    * the same byte slices, then mirrors the distinct → cold-filter →
    * pair-count chain. */
  def oracleSql(frameBytes: Int, stride: Int, minShared: Int, maxDocs: Int): String =
    s"""WITH ${pairCtes(frameBytes, stride, minShared, maxDocs)}
       |SELECT doc_a, doc_b, shared_frames FROM vp""".stripMargin

  /** qm11: duplicate-cluster labels over the video copy-pair graph —
    * the qm07/qm10/qd16 recursive transitive-closure oracle applied to
    * the shared-frame edges. */
  def oracleComponentsSql(frameBytes: Int, stride: Int, minShared: Int, maxDocs: Int): String =
    s"""WITH RECURSIVE ${pairCtes(frameBytes, stride, minShared, maxDocs)},
       |sym AS (SELECT doc_a AS a, doc_b AS b FROM vp
       |        UNION SELECT doc_b AS a, doc_a AS b FROM vp),
       |reach AS (
       |  SELECT a AS node, b AS other FROM sym
       |  UNION
       |  SELECT r.node, s.b AS other FROM reach r JOIN sym s ON r.other = s.a
       |)
       |SELECT dd.doc_id,
       |       least(dd.doc_id, coalesce(m.mn, dd.doc_id)) AS component
       |FROM documents dd
       |LEFT JOIN (SELECT node, min(other) AS mn FROM reach GROUP BY node) m
       |  ON dd.doc_id = m.node""".stripMargin
}
