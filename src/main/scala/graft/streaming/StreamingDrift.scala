package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming distribution-drift monitor: per (group, event-time window),
  * the total-variation distance of the window's bucket-share vector
  * against a STATIC baseline — the streaming twin of
  * `operators.Anomaly.distributionDrift` ("alert when this week's
  * purchase-value distribution shifts from the reference week").
  *
  * The baseline is a bounded (group, bucket) -> share_micros relation
  * (groups x buckets rows — reference-period statistics computed once by
  * the batch operator), shipped to executors in the task closure like any
  * broadcast dimension.
  *
  * Emission is FINAL per (group, window): bucket counts accumulate in
  * state until the event-time watermark passes the window end, then the
  * TV row is emitted exactly once and the state removed — so the output
  * stream is append-only and never needs retraction, and state is
  * O(active windows x buckets), never O(history). Late rows past the
  * watermark are dropped by the watermark operator itself, which is the
  * standard bounded-lateness contract.
  *
  * TV arithmetic is the batch operator's, bit for bit: shares are
  * `n * 1e6 div total` integer micros, buckets missing on either side
  * contribute their full share, and the sum halves by integer division —
  * StreamingSpec pins streaming == batch on a replayed fixture.
  */
object StreamingDrift {

  final case class BucketRow(grp: String, ts: java.sql.Timestamp, bucket: Long)
  final case class DriftRow(grp: String, window_start_ms: Long,
      n_events: Long, tv_micros: Long)

  /** Final-emission TV for one closed window's counts. Pure — extracted
    * so the arithmetic is directly testable against the batch operator. */
  private[graft] def tvOf(grp: String, counts: Map[Long, Long],
      baseline: Map[(String, Long), Long]): (Long, Long) = {
    val tot = counts.values.sum
    val shares = counts.map { case (b, n) => b -> n * 1000000L / tot }
    val buckets = shares.keySet ++
      baseline.collect { case ((g, b), _) if g == grp => b }
    val tv = buckets.toSeq.map { b =>
      math.abs(shares.getOrElse(b, 0L) - baseline.getOrElse((grp, b), 0L))
    }.sum / 2
    (tot, tv)
  }

  /** @param rows       streaming (grp, ts, bucket) rows
    * @param baseline   static (group, bucket) -> share_micros reference
    * @param windowMs   tumbling window length (event-time millis)
    * @param watermarkDelay out-of-orderness bound, e.g. "10 minutes"
    */
  def drift(spark: SparkSession, rows: DataFrame,
      baseline: Map[(String, Long), Long], windowMs: Long,
      watermarkDelay: String): Dataset[DriftRow] = {
    import spark.implicits._
    require(windowMs > 0)
    rows
      .withWatermark("ts", watermarkDelay)
      .select(col("grp"), col("ts"), col("bucket"))
      .as[BucketRow]
      .groupByKey(r => (r.grp, r.ts.getTime / windowMs))
      .flatMapGroupsWithState[Map[Long, Long], DriftRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((grp, win), batch, state: GroupState[Map[Long, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            val (tot, tv) = tvOf(grp, counts, baseline)
            Iterator.single(DriftRow(grp, win * windowMs, tot, tv))
          } else {
            val upd = batch.foldLeft(state.getOption.getOrElse(Map.empty)) {
              (acc, r) => acc.updated(r.bucket, acc.getOrElse(r.bucket, 0L) + 1L)
            }
            state.update(upd)
            // fire once the watermark passes the window end (timeout must
            // sit strictly beyond the current watermark)
            state.setTimeoutTimestamp(math.max((win + 1) * windowMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
