package graft.streaming

import org.apache.spark.sql.functions._

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.Tables
import graft.operators.text.SequencePack

class PackIngestSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents").cache()

  test("streamed appends equal the one-shot packing; replays are no-ops") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    // id-ordered batches (the append-only convention appendAssign
    // documents): lower half first, then upper half plus a replayed
    // slice of the lower half
    val all = docs.select(col("doc_id"), col("text"))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val (first, second) = all.splitAt(all.size / 2)

    val dir = java.nio.file.Files.createTempDirectory("graft_pi").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_pi_ck").toString
    val mem = MemoryStream[(Long, String)]
    val df = mem.toDF().toDF("doc_id", "text")

    def drain(): Unit = {
      val q = PackIngest.ingest(df, col("text"), col("doc_id"),
        dir, ckpt, capacity = 128, shards = 4)
      q.awaitTermination()
    }
    mem.addData(first: _*)
    drain()
    mem.addData(second ++ first.take(15): _*)
    drain()

    val streamed = PackIngest.assignment(spark, dir)
    assert(streamed.count() == all.size.toLong, "replayed ids re-packed")
    val oneShot = SequencePack.assign(docs, col("text"), col("doc_id"),
      capacity = 128, shards = 4)
    assert(streamed.exceptAll(oneShot).isEmpty &&
      oneShot.exceptAll(streamed).isEmpty,
      "streamed packing diverges from the one-shot packing")
  }

  test("appendBatch is idempotent on a verbatim re-run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pi_b").toString
    PackIngest.appendBatch(docs, col("text"), col("doc_id"),
      dir, capacity = 128, shards = 4)
    val once = PackIngest.assignment(spark, dir).count()
    PackIngest.appendBatch(docs, col("text"), col("doc_id"),
      dir, capacity = 128, shards = 4)
    assert(PackIngest.assignment(spark, dir).count() == once,
      "re-running the same batch appended rows")
  }

  // the session is shared across suites: leaving the fixture cached
  // would poison PlanShapeSpec's column-pruning pins (the cache's
  // internal scan reads every column)
  override def afterAll(): Unit = {
    docs.unpersist()
    super.afterAll()
  }
}
