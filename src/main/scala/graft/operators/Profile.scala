package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic one-pass column profiling — the ANALYZE-TABLE-shaped operator:
  * for each requested column, row count, non-null count, exact distinct
  * count, and min/max (stringified so heterogeneous columns share one
  * result schema).
  *
  * Shape: ONE aggregation job over the table produces a single wide row
  * (4 stats x k columns); a driver-free projection then explodes it into
  * the per-column relation. The multiple exact `count_distinct`s compile
  * to Spark's Expand strategy — the input is replicated k times in the
  * map stage. That is the documented cost of EXACT profiling (what the
  * oracle checks); at fleet scale swap `approx_count_distinct` in the
  * same frame for a single-pass sketch when 2% error is acceptable.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.forall(df.columns.contains),
      s"unknown columns: ${cols.filterNot(df.columns.contains).mkString(", ")}")
    val aggs = count(lit(1)).as("n") +: cols.flatMap { c =>
      Seq(count(col(c)).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__mn_$c"),
        max(col(c)).cast("string").as(s"__mx_$c"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col("n").as("n_rows"),
        col(s"__nn_$c").as("n_nonnull"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__mn_$c").as("min_value"),
        col(s"__mx_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }
}
