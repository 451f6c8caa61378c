package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Statistical outlier detection over grouped bucket totals (the
  * time-series monitoring shape: "which days were anomalous for each
  * event type / source / pipeline stage?").
  *
  * The z-score test is evaluated by exact cross-multiplied integer
  * algebra instead of a float mean/stddev: with per-group `m` buckets,
  * `S = Σt`, `Q = Σt²`, the population test `|t - S/m| > z·sd` (where
  * `sd² = (m·Q - S²)/m²`) is equivalent to
  *
  *   100 · (m·t - S)² > z10² · (m·Q - S²)
  *
  * for `z = z10/10`. Both sides are exact DECIMAL(38,0) products of
  * BIGINT inputs — no square root, no float accumulation — so any two
  * engines (and any partitioning of the aggregate) agree bit for bit.
  * Headroom: inputs up to ~1e15 with ~1e4 buckets/group stay under 38
  * digits; micros-scaled daily totals at fleet scale sit well inside.
  */
object Anomaly {

  /** Flag outlier rows of an already-aggregated per-(group, bucket)
    * relation. `daily` carries one row per bucket with a BIGINT total;
    * every input column is preserved and `is_anomaly` (BIGINT 0/1) is
    * appended. A zero-variance group flags nothing (both sides are 0).
    *
    * Scale shape: the group statistics are a window over the BUCKET
    * relation — groups x buckets rows, orders of magnitude smaller than
    * the fact table that produced it — so the flagging pass costs one
    * compact shuffle; the fact-table aggregate that feeds it is the
    * caller's (already partition-parallel) groupBy. */
  def flagOutliers(daily: DataFrame, groupCols: Seq[String],
      totalCol: String, sigmaX10: Int = 30): DataFrame = {
    require(groupCols.nonEmpty && sigmaX10 >= 0)
    val t = col(totalCol).cast("decimal(38,0)")
    val w = Window.partitionBy(groupCols.map(col): _*)
    val dev = col("__m") * t - col("__s")
    daily
      .withColumn("__m", count(lit(1)).over(w).cast("decimal(38,0)"))
      .withColumn("__s", sum(t).over(w))
      .withColumn("__q", sum(t * t).over(w))
      .withColumn("is_anomaly",
        when(lit(100L) * dev * dev >
          lit(sigmaX10.toLong * sigmaX10) *
            (col("__m") * col("__q") - col("__s") * col("__s")), 1L)
          .otherwise(0L))
      .drop("__m", "__s", "__q")
  }

  /** Per-period distribution drift against each group's EARLIEST period —
    * the population-stability monitor ("did the value distribution of
    * purchases shift this week?"). Rows are bucketed by the caller's
    * expression; drift of a (group, period) is the total-variation
    * distance between its bucket-share vector and the group's baseline
    * period, in exact integer micros:
    * `tv = Σ_buckets |share_p - share_base| div 2`.
    *
    * Scale shape: ONE fact-table aggregate to (group, period, bucket)
    * counts — map-side combine does the heavy lifting — and every later
    * step (shares, baseline selection, period x baseline-bucket
    * expansion, TV sum) runs on that compact relation, which is persisted
    * across its consumers and released once the groups x periods result
    * materializes. Buckets missing on either side contribute their full
    * share, so TV is exact, not join-intersection-only.
    */
  def distributionDrift(df: DataFrame, group: org.apache.spark.sql.Column,
      period: org.apache.spark.sql.Column,
      bucket: org.apache.spark.sql.Column): DataFrame = {
    val counts = df
      .select(group.as("grp"), period.as("period"), bucket.as("bucket"))
      .groupBy("grp", "period", "bucket").agg(count(lit(1)).as("n"))
      .persist()
    val wp = Window.partitionBy("grp", "period")
    val shares = counts
      .withColumn("tot", sum("n").over(wp))
      .withColumn("share", expr("n * 1000000 div tot"))
    val basePeriod = counts.groupBy("grp").agg(min("period").as("bp"))
    val base = shares.join(basePeriod,
        shares("grp") === basePeriod("grp") &&
          shares("period") === basePeriod("bp"))
      .select(shares("grp"), col("bucket"), col("share").as("base_share"))
    val periods = counts.select("grp", "period").distinct()
    // every (period, baseline bucket) exists even when unobserved...
    val expected = periods.join(base, "grp")
    // ...and every observed bucket exists even when absent at baseline
    val full = expected
      .join(shares.select(col("grp"), col("period"), col("bucket"),
          col("share"), col("tot")),
        Seq("grp", "period", "bucket"), "full_outer")
    val out = full
      .select(col("grp"), col("period"),
        abs(coalesce(col("share"), lit(0L)) -
          coalesce(col("base_share"), lit(0L))).as("d"),
        col("tot"))
      .groupBy("grp", "period")
      .agg(max("tot").as("n_events"),
        expr("sum(d) div 2").as("tv_micros"))
      .localCheckpoint(true)
    counts.unpersist()
    out
  }
}
