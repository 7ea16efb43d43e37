package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization via
  * `flatMapGroupsWithState` (the `KeyValueGroupedDataset` state API the
  * brief names for custom state; batch twin = q42_sessionize).
  *
  * State per user = the open session (start, last-seen, count). An event
  * folds in if it arrives within the gap; otherwise the closed session is
  * EMITTED and the state resets — with an event-time timeout so state
  * cannot grow unboundedly (same bounded-state rule as the watermarked
  * dedup). Output is append-mode: only closed sessions.
  *
  * Ordering: events are sorted within each micro-batch, but ACROSS
  * micro-batches the fold assumes in-order-per-key delivery (e.g. a
  * time-ordered replay or a source partitioned by key). Handling
  * arbitrarily late data would require buffering events in state until
  * the watermark passes before folding — deliberately not done here, to
  * keep per-key state O(1) instead of O(events-in-horizon).
  */
object SessionState {

  final case class Event(user_id: Long, ts: Timestamp, event_id: Long)
  final case class OpenSession(start: Timestamp, last: Timestamp, nEvents: Long)
  final case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, duration_sec: Long)

  final val GapMs: Long = 30L * 60 * 1000

  def sessionize(user: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    // duration truncates each ENDPOINT to seconds (unix_timestamp
    // semantics, matching batch q42), not the difference
    def close(s: OpenSession): ClosedSession = ClosedSession(
      user, s.start, s.last, s.nEvents,
      math.floorDiv(s.last.getTime, 1000) - math.floorDiv(s.start.getTime, 1000))

    if (state.hasTimedOut) {
      val out = state.getOption.map(close).iterator
      state.remove()
      return out
    }
    val sorted = events.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
    val closed = Seq.newBuilder[ClosedSession]
    var open = state.getOption
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts.getTime - s.last.getTime <= GapMs =>
          // a cross-batch out-of-order event (>= watermark but < s.last)
          // folds in WITHOUT regressing the envelope: a plain last := e.ts
          // would move session_end backwards and emit negative durations
          open = Some(OpenSession(
            if (e.ts.before(s.start)) e.ts else s.start,
            if (e.ts.after(s.last)) e.ts else s.last,
            s.nEvents + 1))
        case Some(s) =>
          closed += close(s)
          open = Some(OpenSession(e.ts, e.ts, 1))
        case None =>
          open = Some(OpenSession(e.ts, e.ts, 1))
      }
    }
    open.foreach { s =>
      state.update(s)
      // close the session if no event arrives for a gap past the watermark
      state.setTimeoutTimestamp(s.last.getTime + GapMs)
    }
    closed.result().iterator
  }

  /** Wire the stateful sessionizer over a streaming events frame. */
  def streamSessions(spark: SparkSession, events: Dataset[Event]): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        sessionize)
  }
}
