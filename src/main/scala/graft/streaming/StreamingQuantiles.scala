package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming windowed quantile monitor: per (group, event-time window),
  * exact nearest-rank quantiles of an integer value — the "p50/p90/p99
  * latency per window" observability query, emitted FINALLY once per
  * closed window.
  *
  * Exactness over a sketch: the per-window state is a value→count map,
  * so the emitted quantiles are true rank statistics of the window's
  * values — no Greenwald–Khanna merge-order dependence, which is what
  * makes the batch-replay equivalence gate exact (the batch twin is a
  * cumulative-count window computation over the same rows; a
  * `percentile_approx` stream would only be gate-able within rank-error
  * bounds). The price is state linear in the window's DISTINCT values:
  * the caller buckets unbounded-cardinality values first (`v div width`
  * — the same contract as [[StreamingDrift]]'s bucket column), after
  * which state is O(active windows x buckets).
  *
  * Quantile definition (cross-engine exact): for percentile `p` micros,
  * the value at 0-based sorted index `(n - 1) * p div 1e6` — the
  * nearest-rank-lower form, all-integer, so re-runs, the batch twin and
  * any SQL re-derivation agree bit-for-bit.
  *
  * Emission machinery is [[StreamingDrift]]'s: counts accumulate in
  * state until the event-time watermark passes the window end, then one
  * append-only row per (group, window) and the state is removed.
  */
object StreamingQuantiles {

  final case class ValueRow(grp: String, ts: java.sql.Timestamp, v: Long)
  final case class QuantileRow(grp: String, window_start_ms: Long,
      n: Long, qs: Seq[Long])

  /** Exact nearest-rank-lower quantiles from one closed window's
    * value counts. Pure — directly testable against any independent
    * derivation. */
  private[graft] def quantilesOf(counts: Map[Long, Long],
      psMicros: Seq[Long]): (Long, Seq[Long]) = {
    val n = counts.values.sum
    val sorted = counts.toSeq.sortBy(_._1)
    val qs = psMicros.map { p =>
      val idx = (n - 1) * p / 1000000L
      var cum = 0L
      sorted.find { case (_, c) => cum += c; cum > idx }.get._1
    }
    (n, qs)
  }

  /** @param rows       streaming (grp, ts, v) rows — `v` pre-bucketed if
    *                    its cardinality is unbounded
    * @param windowMs   tumbling window length (event-time millis)
    * @param watermarkDelay out-of-orderness bound, e.g. "10 minutes"
    * @param psMicros   percentiles in integer micros, e.g.
    *                    Seq(500000L, 900000L, 990000L) for p50/p90/p99
    */
  def quantiles(spark: SparkSession, rows: DataFrame, windowMs: Long,
      watermarkDelay: String,
      psMicros: Seq[Long] = Seq(500000L, 900000L, 990000L))
      : Dataset[QuantileRow] = {
    import spark.implicits._
    require(windowMs > 0)
    require(psMicros.nonEmpty &&
      psMicros.forall(p => p >= 0L && p <= 1000000L),
      s"percentile micros must be in [0, 1e6]: $psMicros")
    rows
      .withWatermark("ts", watermarkDelay)
      .select(col("grp"), col("ts"), col("v"))
      .as[ValueRow]
      .groupByKey(r => (r.grp, r.ts.getTime / windowMs))
      .flatMapGroupsWithState[Map[Long, Long], QuantileRow](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((grp, win), batch, state: GroupState[Map[Long, Long]]) =>
          if (state.hasTimedOut) {
            val counts = state.get
            state.remove()
            val (n, qs) = quantilesOf(counts, psMicros)
            Iterator.single(QuantileRow(grp, win * windowMs, n, qs))
          } else {
            val upd = batch.foldLeft(state.getOption.getOrElse(Map.empty)) {
              (acc, r) => acc.updated(r.v, acc.getOrElse(r.v, 0L) + 1L)
            }
            state.update(upd)
            state.setTimeoutTimestamp(math.max((win + 1) * windowMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
