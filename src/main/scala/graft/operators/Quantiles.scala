package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-merge grouped quantiles.
  *
  * The exact rank-statistic quantile family (`q_value_outliers`,
  * `q_doc_length_quantiles`) computes `row_number()` over a per-group
  * global sort — correct at any scale, but with FEW groups the sort's
  * parallelism is capped at the group count: 5 languages over 100 TB means
  * 5 sort tasks each holding 20 TB. This operator is the scale path for
  * that shape: Spark's `percentile_approx` (a Greenwald–Khanna quantile
  * sketch, Greenwald & Khanna, SIGMOD 2001) aggregates per-partition
  * sketches and merges them — map-side partials, bounded memory
  * (O(accuracy) per group per partition), no global sort, parallelism
  * follows the DATA not the group count.
  *
  * Accuracy contract (pinned by QuantilesSpec): with `accuracy > n` the
  * sketch retains every sample (the GK compression threshold
  * `2 * eps * n < 1` never merges) and `query(p)` returns the value at
  * rank `ceil(p * n)` — bit-identical to the exact rank-statistic form.
  * At scale, a smaller accuracy trades that exactness for the documented
  * `eps = 1/accuracy` relative-rank error.
  */
object Quantiles {

  /** One row per group: `groupCols*, n, q_0..q_{k-1}` — the approximate
    * `ps(i)` quantile of `valueCol` in column `q_i`. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      ps: Seq[Double], accuracy: Int): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $ps")
    val pArr = ps.mkString("array(", ", ", ")")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile_approx($valueCol, $pArr, $accuracy)").as("__qs"),
        count(lit(1)).as("n"))
    val qCols = ps.indices.map(i => element_at(col("__qs"), i + 1).as(s"q_$i"))
    agg.select(groupCols.map(col) ++ (col("n") +: qCols): _*)
  }

  /** Tukey IQR upper fences per group from sketched quartiles:
    * `groupCols*, hi` with `hi = q3 + 1.5 * (q3 - q1)` — the same IEEE
    * expression, in the same order, as the exact-fence queries, so equal
    * quartiles give bit-equal fences. */
  def iqrUpperFences(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     accuracy: Int): DataFrame = {
    val q = approxQuantiles(df, groupCols, valueCol, Seq(0.25, 0.75), accuracy)
    q.select(groupCols.map(col) :+
      (col("q_1") + lit(1.5) * (col("q_1") - col("q_0"))).as("hi"): _*)
  }

  /** Rows of `df` whose `valueCol` exceeds the group's sketched upper
    * fence. The fence relation is one row per group — broadcast, so the
    * fact side is filtered with zero additional shuffles. */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  accuracy: Int): DataFrame = {
    val fences = iqrUpperFences(df, groupCols, valueCol, accuracy)
    df.join(broadcast(fences), groupCols)
      .where(col(valueCol) > col("hi"))
      .drop("hi")
  }
}
