package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom-state sessionization via `flatMapGroupsWithState` — the
  * KeyValueGroupedDataset/GroupState surface for session logic that
  * `session_window` can't express (per-session running aggregates,
  * custom close conditions, emitted session ids). Semantics match
  * [[EventPipeline.sessionize]] exactly (gap on ts in event_id order),
  * and the spec asserts the two implementations agree row-for-row.
  *
  * Scale shape: state is one small record per active (user, session);
  * in streaming the watermark bounds how long a session can stay open
  * (pair with GroupStateTimeout.EventTimeTimeout to flush on event-time
  * expiry); in batch each key is processed once and state is transient.
  * The shuffle is the groupByKey on user_id — the same single shuffle
  * the window implementation pays.
  */
object StatefulSessions {

  /** `ts` rides along untouched so the watermark metadata on the
    * event-time column survives the projection — the streaming planner
    * requires it in the FlatMapGroupsWithState child for
    * EventTimeTimeout; the walk itself uses only `tsSecs`. */
  final case class EventKeyed(
      user_id: Long,
      event_id: Long,
      tsSecs: Long,
      ts: java.sql.Timestamp)
  final case class SessionRow(
      user_id: Long,
      session_id: Long,
      n_events: Long,
      first_event: Long,
      last_event: Long)
  /** Carried across micro-batches in streaming; transient in batch. */
  final case class SessState(
      sessionId: Long,
      lastTsSecs: Long,
      n: Long,
      first: Long,
      last: Long)

  /** Walk a user's events in event_id order, cutting a new session when
    * the inter-event gap exceeds `gapSeconds`. Emits every completed
    * session. The final OPEN session is emitted only in batch mode
    * (each key is seen exactly once, so "end of input" closes it); in
    * streaming it stays in state — re-emitting it per micro-batch would
    * produce duplicate/overlapping rows in Append mode — and is flushed
    * by the event-time timeout once the watermark passes lastTs+gap. */
  private def walk(
      uid: Long,
      events: Iterator[EventKeyed],
      state: GroupState[SessState],
      gapSecs: Long,
      streaming: Boolean): Iterator[SessionRow] = {
    if (streaming && state.hasTimedOut) {
      // watermark passed lastTs+gap: the open session can never extend.
      // Removing state also drops the per-user session counter, so a
      // user who returns AFTER a timeout flush restarts at session_id 1
      // — session_id is unique per (user, state lifetime), not per user
      // forever. Downstream keys that must be globally unique should
      // combine it with first_event (stable and globally unique).
      val closed = state.getOption.collect {
        case st if st.n > 0L =>
          SessionRow(uid, st.sessionId, st.n, st.first, st.last)
      }
      state.remove()
      return closed.iterator
    }
    val sorted = events.toArray.sortBy(_.event_id)
    if (sorted.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.ArrayBuffer[SessionRow]()
    var st = state.getOption.getOrElse(SessState(0L, Long.MinValue, 0L, 0L, 0L))
    sorted.foreach { e =>
      val newSession = st.n == 0L || e.tsSecs - st.lastTsSecs > gapSecs
      if (newSession) {
        if (st.n > 0L)
          out += SessionRow(uid, st.sessionId, st.n, st.first, st.last)
        st = SessState(st.sessionId + 1, e.tsSecs, 1L, e.event_id, e.event_id)
      } else {
        st = st.copy(
          lastTsSecs = e.tsSecs,
          n = st.n + 1,
          first = math.min(st.first, e.event_id),
          last = math.max(st.last, e.event_id))
      }
    }
    state.update(st)
    if (streaming) {
      // flush the open session when event time passes its gap horizon.
      // lastTsSecs is TRUNCATED seconds, so the true last event time can
      // be up to 999 ms later — the +1s covers the whole truncated
      // second, otherwise a still-on-time extending event (gap measured
      // in whole seconds) could arrive after the timeout already split
      // the session. Clamp to the watermark: a key fed only late data
      // would otherwise compute a horizon in the past, which
      // setTimeoutTimestamp rejects.
      val horizon = (st.lastTsSecs + gapSecs + 1L) * 1000L
      state.setTimeoutTimestamp(math.max(horizon, state.getCurrentWatermarkMs() + 1L))
    } else if (st.n > 0L) {
      out += SessionRow(uid, st.sessionId, st.n, st.first, st.last)
    }
    out.iterator
  }

  /** Batch or streaming entry: events must carry (user_id, event_id,
    * ts). Output schema matches qe03 (user_id, session_id, n_events,
    * first_event, last_event). In streaming a watermark on `ts`
    * (delay `watermarkDelay`) is applied here and EventTimeTimeout
    * flushes each open session once the watermark passes lastTs+gap;
    * sessions still open when the stream ends stay in state (they are
    * not final). Batch closes the final open session at end of input. */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long = 1800,
      watermarkDelay: String = "0 seconds")(
      implicit spark: SparkSession): Dataset[SessionRow] = {
    import spark.implicits._
    val streaming = events.isStreaming
    val timeout =
      if (streaming) GroupStateTimeout.EventTimeTimeout
      else GroupStateTimeout.NoTimeout
    val src = if (streaming) events.withWatermark("ts", watermarkDelay) else events
    src
      .select(
        col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        // truncated-seconds gap arithmetic, identical to the window
        // implementation (unix_timestamp) and the oracle (date_diff)
        floor(unix_micros(col("ts")) / 1000000L).cast("long").as("tsSecs"),
        col("ts"))
      .as[EventKeyed]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionRow](OutputMode.Append, timeout) {
        (uid, it, state) => walk(uid, it, state, gapSeconds, streaming)
      }
  }
}
