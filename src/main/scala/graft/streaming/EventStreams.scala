package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row (the driver's `events` table shape). */
final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double)

/** A closed user session (gap-based sessionization output). */
final case class UserSession(user_id: Long, start: Timestamp, end: Timestamp,
    n_events: Long, total_value: Double)

private final case class SessionState(start: Long, last: Long, n: Long, total: Double)

/** Structured Streaming operators over the events stream — the streaming
  * surface the engine exposes beyond NRT indexing (SURVEY.md §2.6 notes
  * the reference has no event-time semantics; these are the Spark-native
  * stream ops a training-data/telemetry pipeline needs):
  *
  *   - watermarked sliding-window aggregation (event-time, late-data
  *     tolerant) — `readStream → transform`, works identically on a batch
  *     DataFrame (same code path, Catalyst decides);
  *   - gap-based sessionization via `flatMapGroupsWithState` with an
  *     event-time timeout — the custom-state extension point
  *     (`KeyValueGroupedDataset`), emitting a session row when a user goes
  *     quiet for `gapMinutes`.
  */
object EventStreams {

  /** Per-window, per-type counts and sums; watermark bounds state. */
  def windowedCounts(events: DataFrame, windowLen: String = "10 minutes",
                     slide: String = "10 minutes",
                     watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(count("*").as("n"), round(sum(col("value")), 3).as("v"))
      .select(col("window.start").as("w_start"), col("event_type"), col("n"), col("v"))

  /** Gap-based sessions: a user's events belong to one session until a
    * `gapMinutes` quiet period; sessions close on the next event past the
    * gap or on event-time timeout (watermark-driven). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[UserSession] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L
    events
      .withWatermark("ts", s"$gapMinutes minutes")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[UserSession]
          if (state.hasTimedOut) {
            val s = state.get
            out += UserSession(userId, new Timestamp(s.start), new Timestamp(s.last),
              s.n, s.total)
            state.remove()
          } else {
            val sorted = it.toArray.sortBy(_.ts.getTime)
            var cur = state.getOption.orNull
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur = cur match {
                case null => SessionState(t, t, 1, e.value)
                case s if t - s.last <= gapMs =>
                  SessionState(s.start, math.max(s.last, t), s.n + 1, s.total + e.value)
                case s => // gap exceeded: close the old session, start fresh
                  out += UserSession(userId, new Timestamp(s.start),
                    new Timestamp(s.last), s.n, s.total)
                  SessionState(t, t, 1, e.value)
              }
            }
            if (cur != null) {
              state.update(cur)
              state.setTimeoutTimestamp(cur.last + gapMs)
            }
          }
          out.iterator
      }
  }
}
