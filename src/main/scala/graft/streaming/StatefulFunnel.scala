package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state funnel attribution via `flatMapGroupsWithState` — the
  * streaming form of qe10's view→purchase conversion join: a view
  * CONVERTS when the same user purchases within `gapUs` after it.
  * Semantics match the band-join formulation exactly (strict
  * ptus > tus, inclusive ptus <= tus + gap), and the spec asserts the
  * two agree row-for-row in batch; the registry query qe20 rolls the
  * per-view verdicts up to qe10's hourly shape under qe10's own oracle.
  *
  * Why state instead of the join, at stream time: the join needs both
  * sides complete, but a stream sees purchases AFTER their views across
  * micro-batch boundaries. State per user is only the OPEN views — the
  * ones still inside their conversion window; every purchase settles
  * the whole buffer (any buffered view strictly older than the purchase
  * either converts via it or is past its window and can never convert
  * via a later, even-later purchase), so state size is bounded by one
  * user's views per window, not history. Unconverted views flush on
  * event-time timeout once the watermark passes tus + gap; in batch,
  * end of input closes them.
  *
  * Scale shape: the one shuffle is the groupByKey on user_id — the
  * same key the join formulation shuffles on; state records are
  * (event_id, tus) pairs only, never event payloads.
  */
object StatefulFunnel {

  /** `ts` rides along so the watermark column survives the projection
    * (the streaming planner requires it in the child plan for
    * EventTimeTimeout); the walk uses only integer `tus`. */
  final case class FunnelEvent(
      user_id: Long,
      event_id: Long,
      tus: Long,
      is_purchase: Boolean,
      ts: java.sql.Timestamp)
  final case class ViewConv(
      user_id: Long,
      event_id: Long,
      tus: Long,
      converted: Boolean)
  /** Open views: (event_id, tus), every one still inside its window. */
  final case class OpenViews(views: List[(Long, Long)])

  private def walk(
      uid: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[OpenViews],
      gapUs: Long,
      streaming: Boolean): Iterator[ViewConv] = {
    if (streaming && state.hasTimedOut) {
      // watermark passed some open view's horizon: flush expired views
      // as unconverted, keep the rest armed on the next horizon
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val views = state.getOption.map(_.views).getOrElse(Nil)
      val (expired, open) = views.partition { case (_, t) => t + gapUs < wmUs }
      if (open.isEmpty) state.remove()
      else {
        state.update(OpenViews(open))
        armTimeout(state, open, gapUs)
      }
      return expired.map { case (eid, t) =>
        ViewConv(uid, eid, t, converted = false)
      }.iterator
    }
    val sorted = events.toArray.sortBy(e => (e.tus, e.event_id))
    var buf = state.getOption.map(_.views).getOrElse(Nil)
    val out = scala.collection.mutable.ArrayBuffer[ViewConv]()
    sorted.foreach { e =>
      if (!e.is_purchase) buf = buf :+ ((e.event_id, e.tus))
      else {
        val ptus = e.tus
        // strictly-older views settle NOW: in-window ones convert via
        // this purchase; out-of-window ones can never convert (later
        // purchases are even later). Same-microsecond views stay open
        // (qe10's strict ptus > tus).
        val (stay, decide) = buf.partition { case (_, t) => t >= ptus }
        decide.foreach { case (eid, t) =>
          out += ViewConv(uid, eid, t, converted = t >= ptus - gapUs)
        }
        buf = stay
      }
    }
    if (streaming) {
      if (buf.nonEmpty) {
        state.update(OpenViews(buf))
        armTimeout(state, buf, gapUs)
      } else state.remove()
    } else {
      // batch: end of input closes every open view unconverted
      buf.foreach { case (eid, t) => out += ViewConv(uid, eid, t, false) }
      state.remove()
    }
    out.iterator
  }

  /** Timeout at the EARLIEST open view's horizon (+1 ms to cover the
    * µs→ms truncation), clamped above the current watermark, which
    * setTimeoutTimestamp requires. */
  private def armTimeout(
      state: GroupState[OpenViews], open: List[(Long, Long)], gapUs: Long): Unit = {
    val horizonMs = (open.map(_._2).min + gapUs) / 1000L + 1L
    state.setTimeoutTimestamp(
      math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
  }

  /** Batch or streaming entry over an `events`-shaped frame (user_id,
    * event_id, ts, event_type): per-view conversion verdicts. In
    * streaming, converted views emit when their purchase arrives and
    * unconverted ones when the watermark passes their window; views
    * still open at stream end stay in state (not final). */
  def funnel(
      events: DataFrame,
      gapUs: Long = 3600L * 1000000L,
      watermarkDelay: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[ViewConv] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val src =
      if (streaming) events.withWatermark("ts", watermarkDelay) else events
    src
      .filter(col("event_type").isin("view", "purchase"))
      .select(
        col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        unix_micros(col("ts")).as("tus"),
        (col("event_type") === "purchase").as("is_purchase"),
        col("ts"))
      .as[FunnelEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenViews, ViewConv](OutputMode.Append, timeout) {
        (uid, it, state) => walk(uid, it, state, gapUs, streaming)
      }
  }
}
