package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming counterparts of the batch event analytics
  * ([[graft.queries.PipelineQueries]] events_window / events_sessionize),
  * as Structured Streaming transforms over an events-shaped stream
  * `(user_id, event_id, event_type, ts, value)`.
  *
  * The reference engine has no streaming surface (SURVEY.md §2.7) — this
  * module is part of the beyond-parity pipeline layer: the same
  * aggregations a 100 TB batch pipeline runs must also run incrementally
  * on the live event feed. All operators here are incremental and
  * watermark-bounded: state is evicted once event time passes the
  * watermark, so long-running queries hold O(active windows/sessions)
  * state, never unbounded history.
  */
object EventStreams {

  /** Per-user tumbling-window aggregates with a watermark: event counts,
    * distinct-ish type counts (approx_count_distinct — exact distinct is
    * unsupported in streaming agg without complete mode), value cents.
    * Late events beyond `lateness` are dropped; closed windows are final.
    */
  def windowedStats(events: DataFrame, windowDur: String,
                    lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), window(col("ts"), windowDur).as("w"))
      .agg(count(lit(1)).as("n_events"),
        approx_count_distinct("event_type").as("n_types"),
        sum(round(col("value") * 100).cast("long")).as("cents"))
      .select(col("user_id"), col("w.start").as("w_start"),
        col("w.end").as("w_end"), col("n_events"), col("n_types"),
        col("cents"))

  /** Gap-based sessionization with the built-in session_window (gap-merged
    * event-time windows, watermark-evicted) — the declarative path.
    */
  def sessionStats(events: DataFrame, gap: String,
                   lateness: String): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("s"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("s.start").as("s_start"),
        col("s.end").as("s_end"), col("n_events"))

  final case class Event(user_id: Long, event_id: Long, event_type: String,
                         ts: Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class Session(user_id: Long, s_start: Timestamp,
                           s_end: Timestamp, n_events: Long)

  /** Custom-state sessionization via flatMapGroupsWithState — the
    * imperative escape hatch for session semantics session_window cannot
    * express (e.g. emitting only on close, custom merge rules). Emits one
    * row per CLOSED session; open sessions close when no event arrives
    * within `gapMs` of event time (tracked via event-time timeout, so
    * state is bounded by the watermark exactly like the declarative path).
    */
  def sessionizeCustom(events: Dataset[Event], gapMs: Long,
                       lateness: String): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (uid: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n))
          } else {
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                // within gap of the session INTERVAL — including a
                // watermark-admitted straggler just before its start,
                // which extends the session backward (session_window
                // merges the same way)
                case Some(s) if t >= s.start - gapMs && t - s.last <= gapMs =>
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
                case Some(s) if t < s.start - gapMs =>
                  // stale straggler predating the open session by more
                  // than the gap: its own (already-over) session — NOT
                  // silently folded into the current one
                  closed ::= Session(uid, new Timestamp(t), new Timestamp(t), 1)
                case Some(s) =>
                  closed ::= Session(uid, new Timestamp(s.start), new Timestamp(s.last), s.n)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // close when event time passes last + gap
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
