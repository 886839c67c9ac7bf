package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StatefulFunnelSpec extends SparkSpec {

  private val gapUs = 3600L * 1000000L

  /** qe10's join formulation of the same per-view verdicts. */
  private def joined(events: org.apache.spark.sql.DataFrame) = {
    val views = events.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("ptus"))
    val conv = views.join(purchases,
        views("user_id") === purchases("user_id") &&
          col("ptus") > col("tus") && col("ptus") <= col("tus") + gapUs)
      .select(views("event_id")).distinct().withColumn("c", lit(true))
    views.join(conv, Seq("event_id"), "left")
      .select(col("user_id"), col("event_id"), col("tus"),
        coalesce(col("c"), lit(false)).as("converted"))
  }

  test("stateful funnel equals the band-join formulation in batch") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val events = Tables.load(spark, sf0001, "events")
    val stateful = StatefulFunnel.funnel(events).toDF()
    val reference = joined(events)
    assert(stateful.count() == reference.count())
    assert(stateful.exceptAll(reference).isEmpty &&
      reference.exceptAll(stateful).isEmpty,
      "stateful and join funnel attribution disagree")
  }

  test("streaming run: conversions emitted exactly once, opens stay in state") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val events = Tables.load(spark, sf0001, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_stream").toString
    events.write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)
    val stream = spark.readStream.schema(staged.schema).parquet(dir)
    val q = StatefulFunnel.funnel(stream).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("stateful_funnel_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("stateful_funnel_out")
    val batch = StatefulFunnel.funnel(staged).toDF()
    // nothing emitted that batch would not produce (no dups/overlaps)
    assert(streamed.exceptAll(batch).isEmpty,
      "streaming emitted a verdict the batch run does not contain")
    // every CONVERTED view must be present (conversions are settled by
    // data, never by end-of-input); only unconverted views whose window
    // was still open at the final watermark may be absent
    val conv = batch.filter(col("converted"))
    assert(conv.exceptAll(streamed).isEmpty,
      "a data-settled conversion was not emitted by the streaming run")
    val missing = batch.exceptAll(streamed)
    assert(missing.filter(col("converted")).isEmpty,
      "a missing verdict was a conversion, not an open view")
  }

  test("out-of-order purchase in a later batch still converts a buffered view") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long, String)]
    val df = mem.toDF().toDF("user_id", "event_id", "secs", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("secs") * 1000000L).as("ts"), col("event_type"))
    val q = StatefulFunnel
      .funnel(df, gapUs = 3600L * 1000000L, watermarkDelay = "30 minutes")
      .toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("funnel_ooo_out").start()
    try {
      // batch 1: view V at 3600s; purchase P0 at 7210s is OUTSIDE V's
      // 1h window (ends 7200s) — a settle-on-first-later-purchase
      // scheme would finalize V as unconverted here. Watermark after
      // this batch: 7210 - 1800 = 5410s < V's 7200s horizon.
      mem.addData((1L, 10L, 3600L, "view"), (1L, 11L, 7210L, "purchase"))
      q.processAllAvailable()
      // batch 2: OUT-OF-ORDER purchase at 5500s — later than the
      // watermark (admissible) and inside V's window: must convert V
      mem.addData((1L, 12L, 5500L, "purchase"))
      q.processAllAvailable()
      // advance the watermark far past every horizon to flush state
      mem.addData((9L, 98L, 100000L, "view"))
      q.processAllAvailable()
      mem.addData((9L, 99L, 200000L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val verdicts = spark.table("funnel_ooo_out")
      .filter(col("event_id") === 10L)
      .select("converted").as[Boolean].collect().toSeq
    assert(verdicts == Seq(true),
      s"view must convert via the late out-of-order purchase: $verdicts")
  }

  test("window edges: strict ptus > tus, inclusive tus + gap") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val base = 1700000000000000L
    val df = Seq(
      // view converted by a purchase exactly at tus + gap (inclusive)
      (1L, 10L, base, "view"),
      (1L, 11L, base + gapUs, "purchase"),
      // same-microsecond purchase does NOT convert (strict >)
      (2L, 20L, base, "view"),
      (2L, 21L, base, "purchase"),
      // purchase one µs past the window: too late
      (3L, 30L, base, "view"),
      (3L, 31L, base + gapUs + 1L, "purchase"))
      .toDF("user_id", "event_id", "us", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = StatefulFunnel.funnel(df).toDF()
      .select("event_id", "converted")
      .as[(Long, Boolean)].collect().toMap
    assert(got == Map(10L -> true, 20L -> false, 30L -> false), got.toString)
  }
}
