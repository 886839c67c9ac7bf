package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state funnel attribution via `flatMapGroupsWithState` — the
  * streaming form of qe10's view→purchase conversion join: a view
  * CONVERTS when the same user purchases within `gapUs` after it
  * (strict ptus > tus, inclusive ptus <= tus + gap). The spec asserts
  * batch mode agrees with the band-join formulation row-for-row, and
  * the registry query qe20 rolls the per-view verdicts up to qe10's
  * hourly shape under qe10's own oracle.
  *
  * Why state instead of the join, at stream time: the join needs both
  * sides complete, but a stream sees the two sides interleaved across
  * micro-batches — IN EITHER ORDER within the watermark delay. So
  * state per user buffers BOTH sides of the still-settleable window:
  * open views (not yet converted, window not yet passed by the
  * watermark) and recent purchases (which may still convert a late
  * view). A purchase converts matching buffered views immediately
  * (conversion is final — a true verdict can never be revised);
  * unconverted views stay buffered, because an out-of-order purchase
  * in a LATER micro-batch may still fall inside their window — this
  * is exactly the case a settle-on-first-later-purchase scheme gets
  * wrong. A view arriving after its converting purchase settles
  * against the purchase buffer on arrival. Unconverted views flush as
  * final verdicts on event-time timeout once the watermark passes
  * tus + gap; purchases age out on the same horizon. In batch, end of
  * input closes every open view.
  *
  * Scale shape: the one shuffle is the groupByKey on user_id — the
  * same key the join formulation shuffles on; state holds (id, µs)
  * pairs bounded by one conversion window plus the watermark delay,
  * never history; event payloads never enter state.
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
  /** Both still-settleable sides: open views as (event_id, tus),
    * recent purchases as tus. */
  final case class FunnelState(
      views: List[(Long, Long)],
      purchases: List[Long])

  private def walk(
      uid: Long,
      events: Iterator[FunnelEvent],
      state: GroupState[FunnelState],
      gapUs: Long,
      streaming: Boolean): Iterator[ViewConv] = {
    def converts(tus: Long, ptus: Long): Boolean =
      ptus > tus && ptus <= tus + gapUs
    if (streaming && state.hasTimedOut) {
      // watermark passed some horizon: flush expired views as FINAL
      // unconverted verdicts (no admissible purchase can still arrive
      // inside their window), age out expired purchases, re-arm
      val wmUs = state.getCurrentWatermarkMs() * 1000L
      val st = state.getOption.getOrElse(FunnelState(Nil, Nil))
      val (expired, open) = st.views.partition { case (_, t) => t + gapUs < wmUs }
      val keptP = st.purchases.filter(p => p + gapUs >= wmUs)
      if (open.isEmpty && keptP.isEmpty) state.remove()
      else {
        state.update(FunnelState(open, keptP))
        armTimeout(state, open.map(_._2) ++ keptP, gapUs)
      }
      return expired.map { case (eid, t) =>
        ViewConv(uid, eid, t, converted = false)
      }.iterator
    }
    val sorted = events.toArray.sortBy(e => (e.tus, e.event_id))
    val st = state.getOption.getOrElse(FunnelState(Nil, Nil))
    val views = scala.collection.mutable.ArrayBuffer.from(st.views)
    val purchases = scala.collection.mutable.ArrayBuffer.from(st.purchases)
    val out = scala.collection.mutable.ArrayBuffer[ViewConv]()
    sorted.foreach { e =>
      if (e.is_purchase) {
        // settle conversions NOW; unconverted views STAY buffered (a
        // later-arriving out-of-order purchase may still convert them)
        val (conv, keep) = views.partition { case (_, t) => converts(t, e.tus) }
        conv.foreach { case (eid, t) => out += ViewConv(uid, eid, t, true) }
        views.clear(); views ++= keep
        purchases += e.tus
      } else {
        // an out-of-order view settles against already-seen purchases
        if (purchases.exists(p => converts(e.tus, p)))
          out += ViewConv(uid, e.event_id, e.tus, converted = true)
        else views += ((e.event_id, e.tus))
      }
    }
    if (streaming) {
      if (views.isEmpty && purchases.isEmpty) state.remove()
      else {
        state.update(FunnelState(views.toList, purchases.toList))
        armTimeout(state, views.map(_._2).toList ++ purchases.toList, gapUs)
      }
    } else {
      // batch: one sorted pass saw everything — close open views
      views.foreach { case (eid, t) => out += ViewConv(uid, eid, t, false) }
      state.remove()
    }
    out.iterator
  }

  /** Timeout at the EARLIEST buffered element's horizon (+1 ms to cover
    * the µs→ms truncation), clamped above the current watermark, which
    * setTimeoutTimestamp requires. */
  private def armTimeout(
      state: GroupState[FunnelState], tus: Seq[Long], gapUs: Long): Unit = {
    val horizonMs = (tus.min + gapUs) / 1000L + 1L
    state.setTimeoutTimestamp(
      math.max(horizonMs, state.getCurrentWatermarkMs() + 1L))
  }

  /** Batch or streaming entry over an `events`-shaped frame (user_id,
    * event_id, ts, event_type): per-view conversion verdicts. In
    * streaming, converted views emit when their purchase side is known
    * and unconverted ones once the watermark passes their window;
    * views still open at stream end stay in state (not final). */
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
      .flatMapGroupsWithState[FunnelState, ViewConv](OutputMode.Append, timeout) {
        (uid, it, state) => walk(uid, it, state, gapUs, streaming)
      }
  }
}
