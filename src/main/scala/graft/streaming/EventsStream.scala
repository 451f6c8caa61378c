package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

/** Structured-Streaming operators over the events stream: watermarked
  * windowed aggregation and custom session state — the streaming layer
  * SURVEY §7 step 9 calls for (the reference's closest analog is its
  * periodic re-evaluation loop, `Promise.java:353-376`). */
object EventsStream {

  /** Tumbling-window counts per event type with a watermark: late data
    * beyond the watermark is dropped, state is bounded — the only shape
    * that survives an unbounded 100 TB/day stream. */
  def typeCountsPerWindow(events: DataFrame, windowDur: String = "1 hour",
                          watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") * 1000000.0).cast("decimal(38,0)")).cast("long")
          .as("sum_value_micros"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value_micros"))

  final case class Event(user_id: Long, ts_ms: Long, event_type: String, value: Double)
  final case class UserSessions(var last_ms: Long, var sessions: Long)
  final case class SessionCount(user_id: Long, sessions: Long, events: Long)

  /** Per-user session counting with explicit state: a new session starts
    * when the gap to the previous event exceeds `gapMs`. The custom-state
    * path (`mapGroupsWithState`) for semantics windowed aggs can't express. */
  def sessionCounts(spark: SparkSession, events: Dataset[Event],
                    gapMs: Long = 1800000L): Dataset[SessionCount] = {
    import spark.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[UserSessions, SessionCount] {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserSessions]) =>
          val st = state.getOption.getOrElse(UserSessions(Long.MinValue, 0L))
          var n = 0L
          batch.toSeq.sortBy(e => (e.ts_ms, e.event_type)).foreach { e =>
            if (st.last_ms == Long.MinValue || e.ts_ms - st.last_ms > gapMs)
              st.sessions += 1
            st.last_ms = e.ts_ms
            n += 1
          }
          state.update(st)
          SessionCount(userId, st.sessions, n)
      }
  }
}
