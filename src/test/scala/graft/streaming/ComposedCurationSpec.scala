package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup.{ConnectedComponents, MinHashLSH}
import graft.sync.ParquetSink

/** The WHOLE streaming curation family composed in ONE foreachBatch —
  * rules → exact-dup guard → near-dup guard → sink append → CC-store
  * fold → HLL + histogram sidecars — proving the four exactly-once
  * disciplines (fingerprint anti-join, LSH novelty, journaled bucket
  * rewrite + store anti-join, max-fold algebra / batch ledger) hold
  * when stacked in a single pipeline, not just in their per-family
  * specs (round-14 verdict item 5): the stream must equal the
  * one-shot build across EVERY persisted artifact, and a full replay
  * of the stream must change NONE of them. */
class ComposedCurationSpec extends SparkSpec {
  import spark.implicits._

  private implicit val s: SparkSession = spark

  // every surviving text carries C4's terminal punctuation (the line
  // rule requires it) via the shared suffix, which also keeps the
  // near-dup shingle relationships intact on both sides of each pair
  private val ok = " and it certainly ends well."
  private val base =
    "the quick brown fox jumps over the lazy dog again and again today" + ok
  private val other =
    "completely different corpus content about spark partitions and shuffles" + ok
  private val novelStem =
    "a wholly new document with nothing in common with the corpus at all"
  private val novelA = novelStem + ok
  private val novelB =
    "entirely fresh prose concerning watermark semantics in stream joins" + ok
  private val p = MinHashLSH.Params(threshold = 0.3)

  private def corpus = Seq((2L, base), (4L, other)).toDF("doc_id", "text")
  // batch 1: 10 dies on rules (javascript-boilerplate line), 11
  // near-dups corpus doc 2, 12 exactly replays doc 2, 13 is novel
  private def batch1 = Seq(
    (10L, "please enable javascript now ok."),
    (11L, base + " tonight"),
    (12L, base),
    (13L, novelA))
  // batch 2: 21 near-dups 13 (cross-batch: both admitted — the
  // documented guard-freshness semantics — but the CC fold must link
  // them through its folded index), 23 is novel
  private def batch2 = Seq((21L, novelStem + ", right" + ok), (23L, novelB))

  private case class Dirs(sink: graft.sync.FileSink, lsh: String, store: String,
      hll: String, hist: String, index: MinHashLSH.LshIndex, fps: DataFrame)

  private def bootstrap(): Dirs = {
    val root = java.nio.file.Files.createTempDirectory("graft_composed").toString
    val lshDir = s"$root/lsh"; val storeDir = s"$root/cc"
    MinHashLSH.writeIndex(
      MinHashLSH.buildIndex(corpus, col("text"), col("doc_id"), p), lshDir)
    ConnectedComponents.writeComponentsStore(
      ConnectedComponents.components(
        MinHashLSH.candidatePairs(corpus, col("text"), col("doc_id"), p),
        "id_a", "id_b", corpus, "doc_id"),
      "doc_id", storeDir, nBuckets = 8)
    Dirs(ParquetSink(s"$root/sink"), lshDir, storeDir,
      s"$root/hll", s"$root/hist",
      MinHashLSH.buildIndex(corpus, col("text"), col("doc_id"), p),
      IngestPipeline.corpusFingerprints(corpus, col("text")))
  }

  /** The composed per-batch fold — what a production foreachBatch
    * body looks like when one stream maintains everything. */
  private def fold(d: Dirs)(batch: DataFrame, batchId: Long): Unit = {
    val cleaned = batch.filter(
      graft.operators.text.RuleClean.keepPredicate(col("text"), minWords = 3))
    val admitted = graft.operators.Barrier(IngestPipeline
      .curateBatch(cleaned, d.sink, "docs", d.index, d.fps,
        col("text"), "doc_id", p))
    d.sink.append(admitted.drop("__fp"), "docs")
    d.sink.append(
      admitted.select(col("__fp").as("fp")).distinct(), "docs_fps")
    CcIngest.foldBatch(spark, admitted.drop("__fp"), col("text"), "doc_id",
      d.lsh, d.store, p)
    CardinalityIngest.foldBatch(
      admitted.withColumn("source", lit("stream")), col("text"), d.hll)
    HistogramIngest.foldBatch(
      admitted, length(col("text")).cast("double"), d.hist, batchId)
    ()
  }

  private def runStream(d: Dirs): Unit = {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ckpt = java.nio.file.Files.createTempDirectory("graft_composed_ck").toString
    val mem = MemoryStream[(Long, String)]
    def drain(): Unit = mem.toDF().toDF("doc_id", "text").writeStream
      .outputMode("append")
      .option("checkpointLocation", ckpt)
      .foreachBatch(fold(d) _)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
    mem.addData(batch1: _*); drain()
    mem.addData(batch2: _*); drain()
  }

  private def artifacts(d: Dirs): (Set[Long], Long, Map[Long, Long],
      Map[String, Long], Map[Double, Long]) = (
    d.sink.readBack(spark, "docs").select("doc_id").as[Long].collect().toSet,
    d.sink.readBack(spark, "docs_fps").count(),
    ConnectedComponents.readComponentsStore(spark, d.store)
      .select("doc_id", "component").as[(Long, Long)].collect().toMap,
    CardinalityIngest.estimates(spark, d.hll)
      .select(col("source"), col("raw_est").cast("long"))
      .as[(String, Long)].collect().toMap,
    spark.read.parquet(s"${d.hist}/histogram")
      .where(col("kind") === "bucket")
      .select(col("key").cast("double"), col("n").cast("long"))
      .as[(Double, Long)].collect().toMap)

  test("stream equals one-shot across sink, labels, HLL, histogram; replay is a no-op") {
    val streamed = bootstrap()
    runStream(streamed)
    val got = artifacts(streamed)

    // one-shot: the same arrivals as ONE batch against fresh artifacts
    val oneShot = bootstrap()
    fold(oneShot)((batch1 ++ batch2).toDF("doc_id", "text"), 0L)
    val want = artifacts(oneShot)

    assert(got._1 == Set(13L, 21L, 23L), s"sink got ${got._1}")
    assert(got._1 == want._1, "sink diverged from one-shot")
    assert(got._2 == want._2, "fingerprint table diverged")
    assert(got._3 == want._3,
      s"labels diverged:\nstream  ${got._3}\noneshot ${want._3}")
    assert(got._3(21L) == got._3(13L), "cross-batch near-dup edge missed")
    assert(got._4 == want._4, s"HLL diverged: ${got._4} vs ${want._4}")
    assert(got._5 == want._5, s"histogram diverged: ${got._5} vs ${want._5}")

    // FULL replay: same data, fresh checkpoint — every guard engages
    // (exact fps for the sink, store ids for CC, the max-fold for HLL,
    // the batch ledger for the histogram); nothing may change
    val bucketFiles = new java.io.File(streamed.store).listFiles()
      .filter(_.getName.startsWith("comp_bucket="))
      .flatMap(dd => dd.listFiles().map(f =>
        s"${dd.getName}/${f.getName}" -> (f.length(), f.lastModified()))).toMap
    runStream(streamed)
    assert(artifacts(streamed) == got, "replay mutated an artifact")
    val after = new java.io.File(streamed.store).listFiles()
      .filter(_.getName.startsWith("comp_bucket="))
      .flatMap(dd => dd.listFiles().map(f =>
        s"${dd.getName}/${f.getName}" -> (f.length(), f.lastModified()))).toMap
    assert(after == bucketFiles, "replay rewrote label-store bucket files")
  }
}
