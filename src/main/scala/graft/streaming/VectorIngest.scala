package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.similarity.{IvfPq, ProductQuantizer}

/** Streaming ANN index maintenance: a stream of (id, embedding) rows
  * feeds the persisted IVF×PQ serving index ([[IvfPq.appendIndex]])
  * per micro-batch — the vector-side sibling of
  * [[IngestPipeline.curateIngest]]'s document path. foreachBatch for
  * the same reason as there: the append is a composed batch plan
  * (encode → dynamic-partition append), not a streaming-native sink.
  *
  * Exactly-once-by-idempotence: parquet appends under foreachBatch are
  * at-least-once on retry, so each batch anti-joins the index's id
  * column first — a replayed batch finds its ids already present and
  * appends nothing. The guard read prunes to the `id` column (codes
  * are 12-byte rows; the ids-only columnar scan is the cheap part of
  * the index by construction), and within-batch duplicate ids collapse
  * to the first row. Because cells and codebook are frozen constants,
  * the maintained index stays content-identical to a full rebuild over
  * everything ever ingested (the qs24 contract), and probes keep
  * file-level cell pruning throughout.
  */
object VectorIngest {

  /** Append each micro-batch's novel vectors into `indexDir`.
    * AvailableNow by default: drain what exists, then stop — the batch
    * ingestion mode; pass a processing-time trigger for continuous. */
  def appendStream(
      stream: DataFrame,
      vec: Column,
      id: Column,
      indexDir: String,
      checkpointDir: String,
      cb: ProductQuantizer.Codebook = ProductQuantizer.DefaultCodebook,
      trigger: org.apache.spark.sql.streaming.Trigger =
        org.apache.spark.sql.streaming.Trigger.AvailableNow())
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        appendBatch(batch, vec, id, indexDir, cb)
      }
      .trigger(trigger)
      .start()

  /** One batch of the maintenance loop, also usable standalone for
    * batch increments: dedup within the batch, anti-join the index's
    * ids, append only the novel rows' codes. */
  def appendBatch(
      batch: DataFrame,
      vec: Column,
      id: Column,
      indexDir: String,
      cb: ProductQuantizer.Codebook = ProductQuantizer.DefaultCodebook): Unit = {
    val spark = batch.sparkSession
    val rows = batch.select(id.as("id"), vec.as("v")).dropDuplicates("id")
    val novel =
      try {
        val existing = spark.read.parquet(s"$indexDir/codes").select("id")
        rows.join(existing, Seq("id"), "left_anti")
      } catch {
        // first batch: no index yet — everything is novel
        case _: org.apache.spark.sql.AnalysisException => rows
      }
    IvfPq.appendIndex(novel, col("v"), col("id"), indexDir, cb)
  }
}
