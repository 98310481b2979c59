package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import java.sql.Timestamp

/** Structured Streaming operators over the `events` table shape
  * (event_id, ts, user_id, event_type, value, props) — the streaming
  * extension planned in SURVEY.md §2.9/§7.5 (the reference itself is
  * batch-only; its dashboard "interactivity" is re-filtering a cached
  * table).
  *
  * Every transform takes a DataFrame so it works identically on a batch
  * frame (unit tests, backfill) and a `readStream` source — the
  * batch/streaming unification is the point of Structured Streaming.
  * Watermarks bound state: at scale these aggregations hold one state
  * entry per (window, key) only until `watermark` passes the window end.
  */
object EventStreams {

  /** Tumbling event-time window counts with late-data drop. */
  def tumblingCounts(events: DataFrame, width: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"))

  /** Sliding event-time windows. */
  def slidingCounts(events: DataFrame, width: String, slide: String,
      watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("cnt"))

  /** Session windows per user (gap-based, built-in session_window). */
  def sessionCounts(events: DataFrame, gap: String, watermark: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("total_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("cnt"), col("total_value"))

  // ---- custom state: sessionization via flatMapGroupsWithState ----

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(nEvents: Long, totalValue: Double,
      startMs: Long, lastMs: Long)

  final case class SessionSummary(user_id: Long, n_events: Long,
      total_value: Double, start_ms: Long, end_ms: Long, closed: Boolean)

  /** Custom stateful sessionization: closes a user's session once a new
    * event arrives more than `gapMs` after the last one (the
    * `mapGroupsWithState`-family surface the prompt/SURVEY call for;
    * event-time-timeout closing works the same way with
    * GroupStateTimeout.EventTimeTimeout + watermark in production). */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionSummary] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        case (user: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val closed = Seq.newBuilder[SessionSummary]
          sorted.foreach { e =>
            val t = e.ts.getTime
            cur match {
              case Some(s) if t - s.lastMs <= gapMs =>
                cur = Some(s.copy(nEvents = s.nEvents + 1,
                  totalValue = s.totalValue + e.value, lastMs = t))
              case Some(s) =>
                closed += SessionSummary(user, s.nEvents, s.totalValue,
                  s.startMs, s.lastMs, closed = true)
                cur = Some(SessionState(1L, e.value, t, t))
              case None =>
                cur = Some(SessionState(1L, e.value, t, t))
            }
          }
          cur.foreach(state.update)
          closed.result().iterator
      }
  }
}
