package graft.streaming

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class StatefulSessionsSpec extends SparkSpec {

  test("flatMapGroupsWithState sessions equal the window implementation") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val events = Tables.load(spark, sf0001, "events")
    val stateful = StatefulSessions.sessionize(events).toDF()
    val windowed = EventPipeline.sessionize(events)
      .select("user_id", "session_id", "n_events", "first_event", "last_event")
    assert(stateful.count() == windowed.count())
    assert(
      stateful.exceptAll(windowed).isEmpty && windowed.exceptAll(stateful).isEmpty,
      "stateful and windowed sessionization disagree")
  }

  test("runs under the streaming engine with Append-mode session semantics") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val events = Tables.load(spark, sf0001, "events")
    // streaming parquet source rejects TIMESTAMP(NANOS); stage through
    // a batch rewrite (same as EventPipelineSpec)
    val dir = java.nio.file.Files.createTempDirectory("graft_state_stream").toString
    events.write.mode("overwrite").parquet(dir)
    val staged = spark.read.parquet(dir)
    val stream = spark.readStream.schema(staged.schema).parquet(dir)
    val q = StatefulSessions.sessionize(stream).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("stateful_sessions_out")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    val streamed = spark.table("stateful_sessions_out")
    val batch = StatefulSessions.sessionize(staged).toDF()
    // Append semantics: each emitted session is final and emitted once —
    // nothing outside the batch result, no duplicates
    assert(streamed.exceptAll(batch).isEmpty,
      "streaming emitted a session the batch run does not contain (dup or overlap)")
    // every session CLOSED by data (everything but each user's last
    // session) must be present; only a user's final still-open session
    // may legitimately be absent (it stays in state past end-of-stream)
    val lastPerUser = batch
      .groupBy("user_id").agg(max("session_id").as("session_id"))
    val closedByData = batch.join(lastPerUser, Seq("user_id", "session_id"),
      "left_anti")
    assert(closedByData.exceptAll(streamed).isEmpty,
      "a data-closed session was not emitted by the streaming run")
    val missing = batch.exceptAll(streamed)
    assert(missing.join(lastPerUser, Seq("user_id", "session_id"), "left_anti")
      .isEmpty,
      "a missing session is not a per-user final open session")
  }

  test("gap-boundary event arriving after the watermark does not split the session") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val s: org.apache.spark.sql.SparkSession = spark
    implicit val sq: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Long, Long)]
    val df = mem.toDF().toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"))
    val q = StatefulSessions.sessionize(df, gapSeconds = 30).toDF()
      .writeStream.outputMode("append")
      .format("memory").queryName("boundary_out").start()
    try {
      // batch 1: user 1 at 10.9s (tsSecs=10); user 2 at 40.5s drives the
      // watermark BETWEEN the naive truncated-second horizon (40.001s)
      // and the true boundary (41s)
      mem.addData((1L, 10L, 10900000L), (2L, 90L, 40500000L))
      q.processAllAvailable()
      // batch 2: user 1 extends at 40.8s — tsSecs=40, gap exactly 30
      // seconds in truncated arithmetic -> SAME session; a horizon that
      // ignored the truncated sub-second would have flushed already
      mem.addData((1L, 11L, 40800000L))
      q.processAllAvailable()
      // advance the watermark far past every horizon to flush all state
      mem.addData((3L, 98L, 200000000L))
      q.processAllAvailable()
      mem.addData((3L, 99L, 300000000L))
      q.processAllAvailable()
    } finally q.stop()
    val rows = spark.table("boundary_out")
      .filter(col("user_id") === 1L).collect()
    assert(rows.length == 1 && rows.head.getAs[Long]("n_events") == 2L,
      s"session split across the truncated-second boundary: ${rows.mkString(", ")}")
  }

  test("gap boundary: exactly-gap events stay in one session") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    import spark.implicits._
    val base = 1700000000000000L // µs
    val df = Seq(
      (1L, 10L, base),
      (1L, 11L, base + 1800L * 1000000L), // exactly gap -> same session
      (1L, 12L, base + 1800L * 1000000L * 2 + 1000000L) // over gap -> new
    ).toDF("user_id", "event_id", "us")
      .select(col("user_id"), col("event_id"),
        timestamp_micros(col("us")).as("ts"))
    val out = StatefulSessions.sessionize(df)
      .collect().sortBy(r => (r.user_id, r.session_id))
    assert(out.length == 2)
    assert(out(0).n_events == 2 && out(0).first_event == 10L && out(0).last_event == 11L)
    assert(out(1).n_events == 1 && out(1).first_event == 12L)
  }
}
