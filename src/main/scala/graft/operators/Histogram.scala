package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-depth histograms per group — the optimizer-statistics
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
  * Two tiers, the [[Quantiles]] precedent:
  *  - [[equiDepth]] — exact: one rank window per group. Parallelism is
  *    capped at the group count (5 event types over 100 TB = 5 sort
  *    tasks), which is the right trade for many-group shapes.
  *  - [[equiDepthApprox]] — the few-groups/large-n scale path: bounds
  *    come from `percentile_approx` (Greenwald–Khanna) partials merged
  *    map-side — no per-group sort, parallelism follows the data. With
  *    `accuracy > n` and power-of-two `k` the sketch is provably exact
  *    at rank `ceil(i*n/k)` (the GK compression threshold never merges
  *    and `i/k`, `i*n/k` are IEEE-exact), so the two tiers agree
  *    bit-for-bit — pinned by HistogramSpec and gated against the SAME
  *    oracle SQL. Production callers at 100 TB drop `accuracy` to bound
  *    sketch memory, trading the pin for `eps = 1/accuracy` rank error.
  *
  * Values quantize to floored integer micros first (the corpus-wide
  * cross-engine convention).
  */
object Histogram {

  private def quantized(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val vm = floor(col(valueCol) * lit(1000000.0)).cast("long")
    // NULL values are outside the histogram domain in BOTH tiers: the
    // sketch tier's percentile_approx ignores them implicitly, so the
    // exact tier must not count them in n or rank them (nulls sort first
    // under row_number, shifting every boundary) — filter once here so n,
    // ranks, and bucket counts are defined over the same value set.
    df.select(groupCols.map(col) :+ vm.as("vm"): _*).where(col("vm").isNotNull)
  }

  /** Bucket counts from a `(groupCols..., bucket, hi_micros)` boundary
    * relation via CUMULATIVE counts: `cum_i = #{v <= hi_i}` (one
    * broadcast join + one aggregate over the values), then
    * `n_bucket_i = cum_i - cum_{i-1}` on the k-row-per-group boundary
    * relation — values never shuffle a second time, and heavy ties
    * surface as empty buckets between equal boundaries (real
    * distribution information, not an artifact). */
  private def bucketCounts(vals: DataFrame, groupCols: Seq[String],
      bounds: DataFrame): DataFrame = {
    val g = groupCols.map(col)
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

  /** Exact tier. @return (groupCols..., bucket (1..k), hi_micros, n_bucket) */
  def equiDepth(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    val g = groupCols.map(col)
    val vals = quantized(df, groupCols, valueCol)
    // per-group target ranks (k rows per group, built on the tiny
    // group-cardinality count relation): rank_i = ceil(i*n/k) via the
    // (i*n + k-1) div k spelling — positive operands, where truncation
    // == floor, make the +k-1 shift a true ceil. (-((-i*n) div k) is
    // NOT a ceil: Spark div / DuckDB // truncate toward zero.)
    val targets = vals.groupBy(g: _*).agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(
        df.sparkSession.range(1, k + 1).select(col("id").as("bucket"))))
      .select(g ++ Seq(col("bucket"),
        expr(s"(bucket * n + ${k - 1}) div $k").as("rn")): _*)
    // ONE scan of the ranked relation: broadcast equi-join against the
    // target ranks (the r8 spelling streamed ranked k times through a
    // crossJoin(range(k)) filter). groups with n < k map several buckets
    // to one rank — the join fans that row out, one row per bucket.
    // eagerly materialized: bounds feeds BOTH the cumulative-count join
    // and the final join-back — without it each consumer re-runs the
    // whole rank pipeline (seen in the r8 plan audit).
    val ranked = vals.withColumn("rn", row_number().over(
      Window.partitionBy(g: _*).orderBy(col("vm"))))
    val bounds = ranked
      .join(broadcast(targets), groupCols :+ "rn")
      .groupBy(g :+ col("bucket"): _*)
      .agg(max(col("vm")).as("hi_micros"))
      .localCheckpoint(true)
    bucketCounts(vals, groupCols, bounds)
  }

  /** Sketch tier: same output shape and (under the exactness contract
    * in the scaladoc above) same values as [[equiDepth]], with bounds
    * from merged `percentile_approx` partials instead of a per-group
    * rank sort — the plan has NO window over the fact table, so
    * parallelism follows the data, not the group count. */
  def equiDepthApprox(df: DataFrame, groupCols: Seq[String], valueCol: String,
      k: Int, accuracy: Int): DataFrame = {
    require(k >= 1, s"k >= 1, got $k")
    require(accuracy >= 1, s"accuracy >= 1, got $accuracy")
    val g = groupCols.map(col)
    val vals = quantized(df, groupCols, valueCol)
    val ps = (1 to k).map(i => i.toDouble / k)
    val q = Quantiles.approxQuantiles(vals, groupCols, "vm", ps, accuracy)
    val bounds = q
      .select(g :+ posexplode(array(ps.indices.map(i => col(s"q_$i")): _*)): _*)
      .select(g ++ Seq((col("pos") + 1).cast("long").as("bucket"),
        col("col").cast("long").as("hi_micros")): _*)
      .localCheckpoint(true)
    bucketCounts(vals, groupCols, bounds)
  }
}
