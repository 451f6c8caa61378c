package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact equi-depth histograms per group — the optimizer-statistics
  * primitive (range-selectivity and join-cardinality estimation read
  * straight off the buckets; equi-depth bounds the per-bucket error the
  * way equi-width cannot under skew). Together with the count-min
  * inner product (`graft_cms_dot`) this is the stats tier a planner
  * consults before choosing broadcast/shuffle/salt.
  *
  * Semantics (deterministic, oracle-replayable): the i-th upper bound
  * is the value at rank `ceil(i * n / k)` in the group's sorted order —
  * the same rank-statistic convention as the exact quantile queries
  * (engine interpolation formulas differ; a value AT a rank does not).
  * Bucket i then counts values in `(hi_{i-1}, hi_i]`; ties collapse
  * into the bucket owning their boundary, so counts deviate from n/k
  * exactly where duplicate values force them to — that deviation is
  * real information about the distribution, not an artifact.
  *
  * Shape: one rank window per group (the exact-quantile cost model —
  * parallelism is capped at the group count, the documented trade
  * against the sketch path in [[Quantiles]]), then the k-row-per-group
  * boundary relation broadcasts back and bucket assignment is a
  * conditional aggregate — values never shuffle a second time.
  * Values quantize to floored integer micros first (the corpus-wide
  * cross-engine convention).
  */
object Histogram {

  /** @return (groupCols..., bucket (1..k), hi_micros, n_bucket) */
  def equiDepth(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    val vm = floor(col(valueCol) * lit(1000000.0)).cast("long")
    val g = groupCols.map(col)
    val vals = df.select(g :+ vm.as("vm"): _*)
    val ranked = vals
      .withColumn("rn", row_number().over(
        Window.partitionBy(g: _*).orderBy(col("vm"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(g: _*)))
    // the k upper bounds: value at rank ceil(i*n/k), i = 1..k
    // eagerly materialized: bounds feeds BOTH the cumulative-count join
    // and the final join-back — without it each consumer re-runs the
    // whole rank pipeline (seen in the r8 plan audit). k x groups rows,
    // the q_heavy_hitters top-10 checkpoint precedent.
    val bounds = ranked
      .crossJoin(broadcast(
        df.sparkSession.range(1, k + 1).select(col("id").as("bucket"))))
      // ceil(i*n/k) via (i*n + k-1) div k: operands are positive, where
      // truncation == floor, so the +k-1 shift is a true ceil. (The
      // -((-i*n) div k) spelling is NOT a ceil here: Spark's `div` and
      // DuckDB's `//` truncate toward zero, so it collapses to floor —
      // which sent rank 0 for groups with n < k and silently dropped
      // the low buckets.)
      .where(col("rn") === expr(s"(bucket * n + ${k - 1}) div $k"))
      .groupBy(g :+ col("bucket"): _*)
      .agg(max(col("vm")).as("hi_micros"))
      .localCheckpoint(true)
    // bucket counts via CUMULATIVE counts: cum_i = #{v <= hi_i} (one
    // broadcast join + one aggregate over the values), then
    // n_bucket_i = cum_i - cum_{i-1} on the k-row-per-group boundary
    // relation — values never shuffle a second time, and heavy ties
    // surface as empty buckets between equal boundaries (real
    // distribution information, not an artifact)
    val cum = vals.join(broadcast(bounds), groupCols)
      .where(col("vm") <= col("hi_micros"))
      .groupBy(g :+ col("bucket"): _*)
      .agg(count(lit(1)).as("cum"))
    cum.join(bounds, groupCols :+ "bucket")
      .withColumn("n_bucket",
        col("cum") - coalesce(lag(col("cum"), 1).over(
          Window.partitionBy(g: _*).orderBy(col("bucket"))), lit(0L)))
      .select(g ++ Seq(col("bucket"), col("hi_micros"), col("n_bucket")): _*)
  }
}
