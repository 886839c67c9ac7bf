package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators, written once against DataFrame so the same
  * code runs in batch (fixture parquet) and in Structured Streaming
  * (readStream over the same schema) — the transformations below are
  * all streaming-compatible: windowed aggregation with event-time
  * semantics, and sessionization that runs on a bounded window in
  * batch or via session_window in streaming.
  */
object EventPipeline {

  /** Tumbling event-time window aggregate. In streaming, attach
    * `.withWatermark("ts", ...)` upstream (see [[streamingHourly]]). */
  def windowedAgg(events: DataFrame, duration: String): DataFrame =
    events
      .groupBy(window(col("ts"), duration).as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        graft.functions.FixedPoint
          .sumFixedDouble(graft.functions.FixedPoint.scaled(col("value"), 4), 4)
          .as("total_value"))
      .select(
        col("w.start").as("w_start"),
        col("event_type"),
        col("n"),
        col("total_value"))

  /** The qe03 session derivation, shared by [[sessionize]] and
    * [[pathNgrams]]: per-event session ids from a gap cut on
    * truncated-second ts in event_id order (one per-user window). */
  private def sessionLabeled(events: DataFrame, gapSeconds: Long): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    val gap = unix_timestamp(col("ts")) - unix_timestamp(lag("ts", 1).over(byUser))
    events
      .withColumn("new_session",
        when(gap.isNull || gap > gapSeconds, 1).otherwise(0))
      .withColumn("session_id",
        sum("new_session").over(byUser.rowsBetween(Window.unboundedPreceding, 0))
          .cast("bigint"))
  }

  /** Gap-based sessionization (30-min default): a new session starts
    * when a user's inter-event gap exceeds the timeout. Batch shape;
    * the streaming analog is `session_window`
    * (see [[streamingSessions]]). */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    sessionLabeled(events, gapSeconds)
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        min("event_id").as("first_event"),
        max("event_id").as("last_event"))
  }

  /** Top session PATHS — the most common length-`n` event-type
    * sequences users walk inside one session (path/flow mining, the
    * "what do users do before purchasing" product-analytics staple).
    * Sessions are the qe03 derivation (gap cut on truncated-second ts
    * in event_id order); paths are `lead`-composed n-grams WITHIN a
    * session, so no explode and no array materialization — each event
    * row becomes at most one n-gram row via n−1 window leads riding
    * the one (user, session) sort.
    *
    * 100 TB shape: ONE shuffle and ONE sort — session ids are a
    * cumulative sum in event_id order, so they are monotone within the
    * user partition, which lets the n-gram leads ride the SAME
    * per-user window as the session cut (a per-(user, session) window
    * would force a second full exchange + sort of every event): a lead
    * n-gram is a real in-session path iff its (n−1)-th lead still
    * carries the same session id, and session monotonicity makes that
    * check sufficient for every intermediate position too. Then an
    * algebraic count over the tiny path domain (|event types|^n) and a
    * TakeOrdered(k) cut with path-string tiebreak — no global sort. */
  def pathNgrams(
      events: DataFrame, n: Int, k: Int, gapSeconds: Long = 1800): DataFrame = {
    require(n >= 2 && k > 0, s"bad n=$n k=$k")
    val byUser = Window.partitionBy("user_id").orderBy("event_id")
    sessionLabeled(events, gapSeconds)
      .withColumn("path", concat_ws(">",
        (0 until n).map(i => lead(col("event_type"), i).over(byUser)): _*))
      // the n-gram stays inside one session iff its LAST position does
      // (session ids are monotone in event_id); a lead past the user's
      // events is null and drops here too
      .withColumn("__endSess", lead(col("session_id"), n - 1).over(byUser))
      .filter(col("__endSess") === col("session_id"))
      .groupBy("path")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path"))
      .limit(k)
  }

  /** Top event types by decimal-exact total value. */
  def typeStats(events: DataFrame): DataFrame =
    events
      .groupBy("event_type")
      .agg(
        count(lit(1)).as("n"),
        graft.functions.FixedPoint
          .sumFixedDouble(graft.functions.FixedPoint.scaled(col("value"), 4), 4)
          .as("total_value"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))

  /** JSON payload extraction (the `props` column). */
  def extractProps(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"))

  // ----- Structured Streaming variants (same logic, streaming source) -----

  /** Hourly windowed counts with a watermark — streaming-ready plan;
    * feed it a readStream DataFrame with the events schema. */
  def streamingHourly(stream: DataFrame): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"))

  /** Streaming leg of qe16's hourly quantile dashboard: watermarked
    * per-(hour, decimal-bucket) counts — the histogram STATE streams;
    * the quantile walk (a cumulative pass over each hour's
    * domain-bounded bucket set) runs as a cheap batch query over this
    * output whenever estimates are served. State is bounded by
    * hours-in-horizon × buckets-in-domain, never by event count. */
  def streamingHourlyBuckets(stream: DataFrame, p: Int = 3): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"),
        graft.operators.PortableHistogram.bucketLo(
          graft.operators.PortableHistogram.toMilli(col("value")), p)
          .as("bucket_lo"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("bucket_lo"), col("n"))

  /** Streaming exact dedup: duplicates of the key arriving within the
    * watermark horizon are dropped; state expires with the watermark,
    * so the store is bounded by horizon × arrival rate, not by history
    * — the streaming analog of ExactDedup for at-least-once sources. */
  def streamingDedup(
      stream: DataFrame,
      keys: Seq[String],
      eventTime: String = "ts",
      horizon: String = "2 hours"): DataFrame =
    stream
      .withWatermark(eventTime, horizon)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-static enrichment join: each micro-batch hash-joins against
    * the static dimension with an explicit broadcast — the dimension
    * ships once per executor, no shuffle ever touches the stream side
    * (a shuffled join would re-partition every micro-batch). At scale
    * the dimension must fit the broadcast budget; bigger dims want a
    * pre-bucketed layout instead (sync.Bucketing). The static side is
    * re-read per batch only if its plan is uncacheable — cache() it for
    * slowly-changing dims refreshed out of band. */
  def enrich(
      stream: DataFrame,
      dim: DataFrame,
      streamKey: String,
      dimKey: String,
      dimCols: Seq[String]): DataFrame =
    stream.join(
      broadcast(dim.select((dimKey +: dimCols).distinct.map(col): _*)),
      stream(streamKey) === dim(dimKey),
      "left")
      .drop(dim(dimKey))

  /** Stream-stream interval join — the streaming counterpart of
    * RangeJoin.bandJoin: match each left event to right events of the
    * same key landing in (l.ts, l.ts + window]. Both sides carry
    * watermarks, and the time-range condition bounds how long either
    * side's rows wait in state (Spark derives the state watermark from
    * the range), so the join state is horizon x arrival rate — never
    * unbounded. Inner join in Append mode: a match emits exactly once,
    * when both sides have arrived. */
  def streamingBandJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      window: String = "4 hours",
      horizon: String = "4 hours"): DataFrame = {
    val l = left.withWatermark("ts", horizon)
      .select(col(key).as("l_key"), col("event_id").as("l_id"),
        col("ts").as("l_ts"))
    val r = right.withWatermark("ts", horizon)
      .select(col(key).as("r_key"), col("event_id").as("r_id"),
        col("ts").as("r_ts"))
    l.join(r,
      col("l_key") === col("r_key") &&
        col("r_ts") > col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $window"))
      .select(col("l_key").as(key), col("l_id"), col("r_id"),
        col("l_ts"), col("r_ts"))
  }

  /** Streaming sessionization via session_window (gap-based). */
  def streamingSessions(stream: DataFrame, gap: String = "30 minutes"): DataFrame =
    stream
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sw.start").as("s_start"), col("sw.end").as("s_end"),
        col("user_id"), col("n_events"))
}
