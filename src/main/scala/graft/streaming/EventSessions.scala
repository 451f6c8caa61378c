package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Gap-based sessionization on the built-in `session_window` operator —
  * the Spark-native shape: windows `[ts, ts+gap)` merge while they overlap,
  * the state store handles merging/expiry per key, and append-mode output
  * emits a session exactly once, when the event-time watermark passes its
  * close. No custom state code; the same expression sessionizes a batch
  * DataFrame (the spec's equivalence gate replays identical events through
  * both).
  *
  * Boundary semantics: `session_window` merges an event landing exactly on
  * the previous window's end (a new session requires a gap strictly
  * greater than the gap duration) — the same `>` rule as the lag-model
  * batch query `q_sessions`. The equivalence spec pins this boundary.
  *
  * Scale shape: state is partitioned by `user_id`; per-key state is the
  * open sessions of that key only, and the watermark bounds how long a
  * closed-but-unemitted session lives. One shuffle (the keyed aggregation);
  * at ingest scale this is the streaming twin of the one-exchange batch
  * sessionization.
  */
object EventSessions {

  /** Sessions per user: `(user_id, session_start, session_end, n_events,
    * sum_value_micros)`, one row per closed session (append mode). `events`
    * needs (user_id, ts, value); works on streaming and batch frames. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
               watermarkDelay: String = "10 minutes"): DataFrame = {
    val src =
      if (events.isStreaming) events.withWatermark("ts", watermarkDelay)
      else events
    src
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("w"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("value") * 1000000).cast("long")).as("sum_value_micros"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"),
        col("sum_value_micros"))
  }
}
