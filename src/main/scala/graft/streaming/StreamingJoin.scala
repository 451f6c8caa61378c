package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: view-to-purchase attribution
  * as both sides arrive — the streaming twin of the batch interval join
  * (`operators.IntervalJoin` / `q_interval_pairs` shape). Emits every
  * (view, purchase) pair of the same user with the purchase inside
  * `[view_ts, view_ts + window]` (both bounds inclusive — the range
  * predicate is `purchase_ts >= view_ts`, matching the batch oracle).
  *
  * Why this exact contract: "all pairs within the window" is MONOTONE
  * (a new event can add pairs but never retract one), so the append-only
  * streaming output can equal the batch join on any replay where rows
  * arrive within the watermark — the same precisely-scoped
  * equality-with-batch guarantee the funnel/drift operators carry, and
  * StreamingSpec pins it on split replays. An as-of ("latest view only")
  * variant is NOT monotone — a late earlier view would retract an
  * emitted attribution — which is why the streaming surface ships the
  * interval form and as-of stays batch-only (`operators.AsOfJoin`).
  *
  * State bounds: both inputs carry watermarks and the join predicate
  * bounds each side's event time against the other (purchase_ts in
  * [view_ts, view_ts + window]), which is the condition Spark needs to
  * evict buffered rows — views older than `watermark + window` and
  * purchases older than `watermark` are dropped from state, so state is
  * O(window x arrival rate), not O(stream). Without the range predicate
  * the same join would buffer both streams forever.
  */
object StreamingJoin {

  /** @param views     streaming (user_id, view_ts) — `ts` column names are
    *                   fixed by contract so the range predicate is visible
    * @param purchases streaming (user_id, purchase_ts, value)
    * @param window    attribution horizon, SQL interval text
    * @param watermark bounded-lateness horizon for BOTH sides */
  def attributedPairs(views: DataFrame, purchases: DataFrame,
      window: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    joined(views, purchases, window, watermark, "inner")

  /** The production attribution question is two-sided: which views
    * converted — and which did NOT. This is [[attributedPairs]] as a
    * LEFT OUTER stream-stream join: matched pairs emit exactly as the
    * inner form does (same monotone contract, same batch equality on
    * the matched subset), and a view with no purchase emits ONCE with
    * null (purchase_ts, value) — but only when the purchase-side
    * watermark has passed `view_ts + window`, i.e. when no in-lateness
    * purchase can still attribute it. That expiry-driven null is the
    * part batch can't express incrementally (batch re-derives
    * non-conversion from scratch each run; the stream proves it from
    * the watermark) and is exactly the state-eviction condition, so the
    * outer form buffers no more than the inner one. Spark supports the
    * outer join under the same two-sided range predicate — without it
    * (or the watermarks) the planner rejects the query rather than
    * buffering forever. */
  def attributedOrNull(views: DataFrame, purchases: DataFrame,
      window: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    joined(views, purchases, window, watermark, "left_outer")

  private def joined(views: DataFrame, purchases: DataFrame,
      window: String, watermark: String, joinType: String): DataFrame = {
    val v = views
      .select(col("user_id"), col("view_ts"))
      .withWatermark("view_ts", watermark)
    val p = purchases
      .select(col("user_id").as("p_user_id"), col("purchase_ts"), col("value"))
      .withWatermark("purchase_ts", watermark)
    v.join(p,
        col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("view_ts") &&
        col("purchase_ts") <= col("view_ts") + expr(s"INTERVAL $window"),
        joinType)
      .select(col("user_id"), col("view_ts"), col("purchase_ts"), col("value"))
  }
}
