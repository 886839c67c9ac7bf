package graft.streaming

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.{SparkSpec, Tables}

class EventPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.load(spark, sf0001, "events").cache()

  /** The streaming parquet source rejects TIMESTAMP(NANOS) footers
    * (batch reads convert them), so stage the fixture through a batch
    * rewrite — also the realistic stream-source shape (a directory). */
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_stream").toString
    events.write.mode("overwrite").parquet(d)
    d
  }

  test("windowed agg covers every event exactly once") {
    val agg = EventPipeline.windowedAgg(events, "1 hour")
    assert(agg.agg(sum("n")).as[Long].head() == events.count())
  }

  test("sessionize: event totals preserved, sessions are per-user ordered") {
    val sessions = EventPipeline.sessionize(events)
    assert(sessions.agg(sum("n_events")).as[Long].head() == events.count())
    // session ids per user start at 1 and are dense
    val perUser = sessions.groupBy("user_id")
      .agg(min("session_id").as("lo"), max("session_id").as("hi"),
        count(lit(1)).as("n"))
      .collect()
    perUser.foreach { r =>
      assert(r.getAs[Long]("lo") == 1L)
      assert(r.getAs[Long]("hi") == r.getAs[Long]("n"))
    }
  }

  test("json extraction parses every props payload") {
    val k = EventPipeline.extractProps(events)
    assert(k.filter(col("k").isNull).count() == 0)
  }

  test("structured streaming: hourly counts over file source match batch") {
    val stream = spark.readStream.schema(events.schema).parquet(streamDir)
    val q = EventPipeline.streamingHourly(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hourly_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("hourly_out")
    val batch = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))
    assert(streamed.count() == batch.count())
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("structured streaming: hourly histogram buckets match batch; quantile walk matches qe16") {
    val stream = spark.readStream.schema(events.schema).parquet(streamDir)
    val q = EventPipeline.streamingHourlyBuckets(stream, p = 3)
      .writeStream.outputMode("complete")
      .format("memory").queryName("hbuckets_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("hbuckets_out")
      .select(
        floor(unix_micros(col("w_start")) / lit(3600000000.0)).cast("long")
          .as("hr"),
        col("bucket_lo"), col("n"))
    val batch = events.select(
        floor(unix_micros(col("ts")) / lit(3600000000.0)).cast("long").as("hr"),
        graft.operators.PortableHistogram.bucketLo(
          graft.operators.PortableHistogram.toMilli(col("value")), 3)
          .as("bucket_lo"))
      .groupBy("hr", "bucket_lo").agg(count(lit(1)).as("n"))
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty,
      "streamed histogram state diverges from batch")

    // the quantile walk over the STREAMED state equals qe16's batch
    // estimator on the same events
    val est = graft.operators.PortableHistogram.groupedQuantiles(
        events, col("value"),
        Seq(floor(unix_micros(col("ts")) / lit(3600000000.0)).cast("long")),
        p = 3, qsPerMille = Seq(500, 990))
      .select(col("g0").as("hr"), col("q_permille"), col("est_milli"))
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val walked = streamed.as[(Long, Long, Long)].collect()
      .groupBy(_._1).flatMap { case (hr, rows) =>
        val sorted = rows.sortBy(_._2)
        val total = sorted.map(_._3).sum
        Seq(500L, 990L).map { qpm =>
          val r = (total * qpm + 999) / 1000
          var cum = 0L
          val est = sorted.collectFirst {
            case (_, b, n) if { cum += n; cum >= r } => b
          }.get
          (hr, qpm) -> est
        }
      }
    walked.foreach { case (k, v) =>
      assert(est(k) == v, s"quantile walk diverges at $k")
    }
  }

  test("structured streaming: watermarked dedup drops re-delivered events") {
    // simulate at-least-once delivery: the staged directory written twice
    val dupDir = java.nio.file.Files.createTempDirectory("graft_dup_stream").toString
    events.write.mode("overwrite").parquet(s"$dupDir/a")
    events.write.mode("overwrite").parquet(s"$dupDir/b")
    val stream = spark.readStream.schema(events.schema)
      .option("recursiveFileLookup", "true").parquet(dupDir)
    val q = EventPipeline.streamingDedup(stream, Seq("event_id"))
      .writeStream.outputMode("append")
      .format("memory").queryName("dedup_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("dedup_out")
    assert(out.count() == events.count(),
      s"expected ${events.count()} unique events, got ${out.count()}")
  }

  test("structured streaming: session_window emits per-user sessions") {
    val stream = spark.readStream.schema(events.schema).parquet(streamDir)
    val q = EventPipeline.streamingSessions(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("sessions_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val out = spark.table("sessions_out")
    assert(out.agg(sum("n_events")).as[Long].head() == events.count())
    assert(out.filter(col("s_end") <= col("s_start")).count() == 0)
  }

  test("structured streaming: stream-stream interval join matches the batch band join") {
    val mk = () => spark.readStream.schema(events.schema).parquet(streamDir)
    val q = EventPipeline
      .streamingBandJoin(
        mk().filter(col("event_type") === "view"),
        mk().filter(col("event_type") === "purchase"),
        "user_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("band_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("band_out").select("user_id", "l_id", "r_id")
    val batch = graft.operators.RangeJoin.bandJoin(
      events.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus")),
      events.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("tus")),
      Seq("user_id"), "tus", "tus", 1L, 4L * 3600L * 1000000L, "p_")
      .select(col("user_id"), col("event_id").as("l_id"),
        col("p_event_id").as("r_id"))
    assert(streamed.count() == batch.count(),
      s"streamed ${streamed.count()} vs batch ${batch.count()}")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("structured streaming: broadcast stream-static enrichment matches batch join") {
    val dim = Tables.load(spark, sf0001, "customer")
    val stream = spark.readStream.schema(events.schema).parquet(streamDir)
    val q = EventPipeline
      .enrich(stream, dim, "user_id", "c_custkey", Seq("c_name", "c_mktsegment"))
      .writeStream.outputMode("append")
      .format("memory").queryName("enrich_out")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("enrich_out")
      .select("event_id", "user_id", "c_name", "c_mktsegment")
    val batch = events
      .join(dim, events("user_id") === dim("c_custkey"), "left")
      .select("event_id", "user_id", "c_name", "c_mktsegment")
    assert(streamed.count() == events.count(),
      "left enrichment must preserve every stream row exactly once")
    assert(streamed.exceptAll(batch).isEmpty && batch.exceptAll(streamed).isEmpty)
  }

  test("path n-grams count only full in-session sequences") {
    val base = 1700000000000000L
    val m = 60L * 1000000L
    val df = Seq(
      // session 1: view > cart > purchase (one 3-gram)
      (1L, 10L, base, "view"),
      (1L, 11L, base + m, "cart"),
      (1L, 12L, base + 2 * m, "purchase"),
      // > 30 min gap: session 2 has only two events — NO 3-gram,
      // and it must not chain across the session boundary
      (1L, 13L, base + 45 * m, "view"),
      (1L, 14L, base + 46 * m, "view"),
      // user 2 repeats the same winning path
      (2L, 20L, base, "view"),
      (2L, 21L, base + m, "cart"),
      (2L, 22L, base + 2 * m, "purchase"))
      .toDF("user_id", "event_id", "us", "event_type")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"), col("event_type"))
    val got = EventPipeline.pathNgrams(df, n = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    assert(got == Seq(("view>cart>purchase", 2L)), got.mkString(","))
  }
}
