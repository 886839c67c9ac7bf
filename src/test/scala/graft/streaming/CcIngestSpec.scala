package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.dedup.{ConnectedComponents, MinHashLSH}

class CcIngestSpec extends SparkSpec {
  import spark.implicits._

  private implicit val s: org.apache.spark.sql.SparkSession = spark

  private val base =
    "the quick brown fox jumps over the lazy dog again and again today"
  private val other =
    "completely different corpus content about spark partitions and shuffles"
  private val p = MinHashLSH.Params(threshold = 0.3)

  private def corpus = Seq((2L, base), (4L, other)).toDF("doc_id", "text")
  // batch 1: 11 near-dups corpus doc 2; 13 is novel
  private def batch1 = Seq(
    (11L, base + " tonight"),
    (13L, "a wholly new document with nothing in common with the corpus at all"))
    .toDF("doc_id", "text")
  // batch 2: 21 near-dups 13 (which arrived in batch 1 — the edge ONLY
  // exists if batch 1's signatures folded into the index); 23 is novel
  private def batch2 = Seq(
    (21L, "a wholly new document with nothing in common with the corpus at all, right"),
    (23L, "entirely fresh prose concerning watermark semantics in stream joins"))
    .toDF("doc_id", "text")

  private def bootstrap(): (String, String) = {
    val root = java.nio.file.Files.createTempDirectory("graft_cc_ingest").toString
    val lshDir = s"$root/lsh"; val storeDir = s"$root/cc"
    MinHashLSH.writeIndex(
      MinHashLSH.buildIndex(corpus, col("text"), col("doc_id"), p), lshDir)
    val labels = ConnectedComponents.components(
      MinHashLSH.candidatePairs(corpus, col("text"), col("doc_id"), p),
      "id_a", "id_b", corpus, "doc_id")
    ConnectedComponents.writeComponentsStore(labels, "doc_id", storeDir, nBuckets = 8)
    (lshDir, storeDir)
  }

  private def labels(storeDir: String): Map[Long, Long] =
    ConnectedComponents.readComponentsStore(spark, storeDir)
      .select("doc_id", "component").as[(Long, Long)].collect().toMap

  private def oneShot: Map[Long, Long] = {
    val union = corpus.unionByName(batch1).unionByName(batch2)
    ConnectedComponents.components(
        MinHashLSH.candidatePairs(union, col("text"), col("doc_id"), p),
        "id_a", "id_b", union, "doc_id")
      .as[(Long, Long)].collect().toMap
  }

  test("batch folds equal the one-shot build, with cross-batch edges") {
    val (lshDir, storeDir) = bootstrap()
    CcIngest.foldBatch(spark, batch1, col("text"), "doc_id", lshDir, storeDir, p)
    CcIngest.foldBatch(spark, batch2, col("text"), "doc_id", lshDir, storeDir, p)
    val got = labels(storeDir)
    assert(got == oneShot, s"stream diverged from one-shot:\n$got\n$oneShot")
    // the load-bearing cross-batch link: 21 (batch 2) near-dups 13
    // (batch 1), an edge only the folded index can mine
    assert(got(21L) == got(13L), "cross-batch near-dup edge missed")
  }

  test("a replayed batch rewrites zero buckets, files byte-identical") {
    val (lshDir, storeDir) = bootstrap()
    CcIngest.foldBatch(spark, batch1, col("text"), "doc_id", lshDir, storeDir, p)
    def snapshot(): Map[String, (Long, Long)] =
      new java.io.File(storeDir).listFiles()
        .filter(_.getName.startsWith("comp_bucket="))
        .flatMap(d => d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => s"${d.getName}/${f.getName}" -> (f.length(), f.lastModified())))
        .toMap
    val before = snapshot()
    val rewritten =
      CcIngest.foldBatch(spark, batch1, col("text"), "doc_id", lshDir, storeDir, p)
    assert(rewritten == 0, s"replay rewrote $rewritten buckets")
    assert(snapshot() == before, "replay mutated bucket files")
    // and the index did not grow duplicate signatures
    val ids = spark.read.parquet(s"$lshDir/docs").select("id").as[Long].collect()
    assert(ids.length == ids.distinct.length, "replay duplicated index signatures")
    // a SECOND fresh batch after the replay still folds correctly
    CcIngest.foldBatch(spark, batch2, col("text"), "doc_id", lshDir, storeDir, p)
    assert(labels(storeDir) == oneShot)
  }

  test("the streaming wrapper drains batches through foldBatch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val (lshDir, storeDir) = bootstrap()
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cc_ckpt").toString
    implicit val sqlc: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    mem.addData(11L -> (base + " tonight"),
      13L -> "a wholly new document with nothing in common with the corpus at all")
    val stream = mem.toDF().toDF("doc_id", "text")
    CcIngest.ingest(stream, col("text"), "doc_id", lshDir, storeDir, ckpt, p)
      .awaitTermination()
    mem.addData(
      21L -> "a wholly new document with nothing in common with the corpus at all, right",
      23L -> "entirely fresh prose concerning watermark semantics in stream joins")
    CcIngest.ingest(stream, col("text"), "doc_id", lshDir, storeDir, ckpt, p)
      .awaitTermination()
    assert(labels(storeDir) == oneShot)
  }
}
