package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Incremental maintenance of a standing per-key aggregate — the
  * ingest-pipeline primitive that keeps daily/rolling rollups current
  * by folding in the APPENDED delta instead of recomputing over full
  * history: at 100 TB the full recompute re-reads a year of data to
  * absorb a day.
  *
  * The maintained state is the classic algebraic tuple
  * `(n, sum_micros, min_v, max_v)` per key — every component merges by
  * a commutative/associative op (sum, sum, min, max), so
  * `merge(aggregate(A), aggregate(B)) == aggregate(A union B)` EXACTLY
  * (sums ride DECIMAL(38,0) micros, the corpus-wide convention — no
  * float drift between the incremental and recomputed paths, which is
  * what lets the oracle check refresh == full recompute by hash).
  * Derived values (avg = sum/n) are computed at READ time from the
  * state, never stored — storing them would break mergeability.
  *
  * Contract: APPEND-ONLY deltas. min/max are not invertible — deletes
  * need a recompute (or a retraction-capable sketch); document-level
  * upserts should route through [[Scd2]]/[[Diff]] first.
  *
  * Shape: `aggregate` is one combine-heavy exchange over the delta
  * (delta-sized, not history-sized); `merge` is one full-outer join of
  * two key-cardinality-sized relations — at equal bucketing/layout both
  * sides co-locate and the join is exchange-free ([[graft.sources.Bucketed]]).
  */
object IncrementalAgg {

  /** Per-key algebraic state over a DOUBLE value column. Like every
    * emitted aggregate in this engine, the state must be hash-comparable
    * across engines: BIGINT micros are exact, while raw doubles invite
    * drift at the compare boundary.
    *
    * Rounding convention (two deliberately different quantizers):
    *  - sum_micros ROUNDS each row half-away-from-zero — the
    *    `cast(v*1e6 as DECIMAL(38,0))` path, the corpus-wide msum
    *    convention. Replays identically in DuckDB because BOTH engines
    *    round double->DECIMAL half-away-from-zero (Spark: BigDecimal
    *    HALF_UP on changePrecision; DuckDB verified: 2.5 -> 3,
    *    -2.5 -> -3).
    *  - min/max FLOOR (`floor(v*1e6)`) — the corpus-wide point-value
    *    convention, and `floor` is floor in both engines.
    * The two differ on any negative fractional micro (floor(-2.5) = -3,
    * round/truncate = -2/-3) and on .5 fractions; IncrementalAggSpec
    * pins a value where floor, truncation and half-away rounding all
    * disagree, so a convention swap on either column fails the spec. */
  def aggregate(rows: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame = {
    val vm = floor(col(valueCol) * lit(1000000.0)).cast("long")
    rows.groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum((col(valueCol) * lit(1000000.0)).cast(DecimalType(38, 0)))
          .cast("long").as("sum_micros"),
        min(vm).as("min_micros"),
        max(vm).as("max_micros"))
  }

  /** Fold a delta's state into the base state: one full-outer join on
    * the keys, componentwise algebraic combine. */
  def merge(base: DataFrame, delta: DataFrame,
      keys: Seq[String]): DataFrame = {
    val b = base.select(keys.map(col) ++ Seq(col("n").as("b_n"),
      col("sum_micros").as("b_s"), col("min_micros").as("b_mn"),
      col("max_micros").as("b_mx")): _*)
    val d = delta.select(keys.map(col) ++ Seq(col("n").as("d_n"),
      col("sum_micros").as("d_s"), col("min_micros").as("d_mn"),
      col("max_micros").as("d_mx")): _*)
    b.join(d, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("b_n"), lit(0L)) + coalesce(col("d_n"), lit(0L))).as("n"),
        (coalesce(col("b_s"), lit(0L)) + coalesce(col("d_s"), lit(0L))).as("sum_micros"),
        least(col("b_mn"), col("d_mn")).as("min_micros"), // least/greatest skip nulls
        greatest(col("b_mx"), col("d_mx")).as("max_micros")): _*)
  }

  /** Refresh the standing aggregate with appended raw rows. */
  def refresh(base: DataFrame, deltaRows: DataFrame, keys: Seq[String],
      valueCol: String): DataFrame =
    merge(base, aggregate(deltaRows, keys, valueCol), keys)
}
