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

  final case class EventKeyed(user_id: Long, event_id: Long, tsSecs: Long)
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
    * the inter-event gap exceeds `gapSeconds`; emits every completed
    * session plus the final open one (batch semantics — in streaming
    * the open session stays in state until timeout). */
  private def walk(
      uid: Long,
      events: Iterator[EventKeyed],
      state: GroupState[SessState],
      gapSecs: Long): Iterator[SessionRow] = {
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
    if (st.n > 0L) out += SessionRow(uid, st.sessionId, st.n, st.first, st.last)
    state.update(st)
    out.iterator
  }

  /** Batch or streaming entry: events must carry (user_id, event_id,
    * ts). Output schema matches qe03 (user_id, session_id, n_events,
    * first_event, last_event). */
  def sessionize(
      events: DataFrame,
      gapSeconds: Long = 1800)(implicit spark: SparkSession): Dataset[SessionRow] = {
    import spark.implicits._
    
    events
      .select(
        col("user_id").cast("long").as("user_id"),
        col("event_id").cast("long").as("event_id"),
        // truncated-seconds gap arithmetic, identical to the window
        // implementation (unix_timestamp) and the oracle (date_diff)
        floor(unix_micros(col("ts")) / 1000000L).cast("long").as("tsSecs"))
      .as[EventKeyed]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid, it, state) => walk(uid, it, state, gapSeconds)
      }
  }
}
