package graft.streaming

import org.apache.spark.sql.functions._

import org.scalatest.BeforeAndAfterAll

import graft.SparkSpec
import graft.Tables
import graft.operators.text.PortableHll

class CardinalityIngestSpec extends SparkSpec with BeforeAndAfterAll {
  import spark.implicits._

  private lazy val docs = Tables.load(spark, sf0001, "documents").cache()

  private def wholeRegs = PortableHll.registers(
    docs.select(col("source"),
      explode(PortableHll.grams(col("text"))).as("term")),
    col("term"), Seq("source"))

  test("streamed folds converge to the whole-corpus sketch; replays are free") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext

    val all = docs.select(col("source"), col("text"))
      .as[(String, String)].collect().toSeq
    val (first, second) = all.splitAt(all.size / 2)

    val dir = java.nio.file.Files.createTempDirectory("graft_ci").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_ci_ck").toString
    val mem = MemoryStream[(String, String)]
    val df = mem.toDF().toDF("source", "text")

    def drain(): Unit = {
      val q = CardinalityIngest.ingest(df, col("text"), dir, ckpt)
      q.awaitTermination()
    }
    mem.addData(first: _*)
    drain()
    // overlap models an at-least-once replay: the max fold must make
    // re-folded rows invisible WITHOUT any novelty machinery
    mem.addData(second ++ first.take(20): _*)
    drain()

    val streamed = spark.read.parquet(s"$dir/registers")
    assert(streamed.exceptAll(wholeRegs).isEmpty &&
      wholeRegs.exceptAll(streamed).isEmpty,
      "streamed registers diverge from the one-shot sketch")
  }

  test("foldBatch is exactly idempotent on a verbatim re-run") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ci_b").toString
    CardinalityIngest.foldBatch(docs, col("text"), dir)
    val once = spark.read.parquet(s"$dir/registers").collect().toSet
    CardinalityIngest.foldBatch(docs, col("text"), dir)
    val twice = spark.read.parquet(s"$dir/registers").collect().toSet
    assert(once == twice, "re-folding the same batch changed registers")
  }

  test("an interrupted swap is adopted, never restarted from one batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ci_x").toString
    CardinalityIngest.foldBatch(docs, col("text"), dir)
    val full = spark.read.parquet(s"$dir/registers").collect().toSet
    // simulate a crash between the swap's renames: live dir moved
    // aside, replacement never moved in
    val live = new org.apache.hadoop.fs.Path(s"$dir/registers")
    val fs = live.getFileSystem(spark.sessionState.newHadoopConf())
    assert(fs.rename(live, graft.operators.StagedSwap.oldPath(live)))
    // the next fold must ADOPT the stranded history — folding a tiny
    // batch again must still equal the full sketch, not restart
    CardinalityIngest.foldBatch(docs.limit(3), col("text"), dir)
    val after = spark.read.parquet(s"$dir/registers").collect().toSet
    assert(after == full, "interrupted swap silently restarted the sketch")
  }

  test("estimates serve from the sidecar and match the batch profile") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ci_e").toString
    CardinalityIngest.foldBatch(docs, col("text"), dir)
    val served = CardinalityIngest.estimates(spark, dir)
      .select("source", "s_scaled", "zero_registers", "raw_est")
    val batch = PortableHll.profile(docs, col("text"), relErrBound = 1.0)
      .select("source", "s_scaled", "zero_registers", "raw_est")
    assert(served.exceptAll(batch).isEmpty && batch.exceptAll(served).isEmpty,
      "served estimates diverge from the batch profile")
    // sidecar is sketch-sized: <= m rows per source
    val n = spark.read.parquet(s"$dir/registers").count()
    val sources = docs.select("source").distinct().count()
    assert(n <= sources * PortableHll.m)
  }

  // the session is shared across suites: leaving the fixture cached
  // would poison PlanShapeSpec's column-pruning pins (the cache's
  // internal scan reads every column)
  override def afterAll(): Unit = {
    docs.unpersist()
    super.afterAll()
  }
}
