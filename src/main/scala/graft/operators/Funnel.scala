package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-funnel analysis: for each entity, the earliest completion
  * time of each step in a required sequence (step i strictly after step
  * i-1, optionally within a conversion window of step 0).
  *
  * Semantics ("earliest completion"): t(1) = min time of a step-1 event;
  * t(i) = min time of a step-i event strictly after t(i-1) (and, with a
  * window W, at most t(1)+W). This is the standard product-analytics
  * funnel definition and is deterministic — no per-row ordering
  * tie-breaks, only mins over a fixed predicate.
  *
  * Shape at scale: each step is a whole-partition window aggregate over
  * the SAME `partitionBy(entity)` — Catalyst plans ONE hash exchange and
  * stacks k Window operators on it, then the per-entity collapse rides the
  * same partitioning. One shuffle total regardless of funnel depth; no
  * self-joins (a k-step funnel as k-1 joins re-shuffles the fact table
  * k-1 times — the shape this operator exists to avoid).
  */
object Funnel {

  /** @param events    one row per event
    * @param entityCol grouping key (e.g. user id)
    * @param tsCol     event time, any orderable numeric (nanos here)
    * @param typeCol   event type / step label column
    * @param steps     ordered step labels, length >= 1
    * @param window    optional conversion window in tsCol units, relative
    *                  to the step-1 time
    * @return one row per entity that reached step 1:
    *         (entityCol, t1..tk in tsCol units, depth)
    */
  def earliestCompletion(
      events: DataFrame,
      entityCol: String,
      tsCol: String,
      typeCol: String,
      steps: Seq[String],
      window: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(steps.distinct.size == steps.size,
      s"duplicate step labels not supported: $steps")
    val w = Window.partitionBy(entityCol)
    val withTimes = steps.zipWithIndex.foldLeft(events) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col(typeCol) === lit(step)
        else {
          val after = col(typeCol) === lit(step) && col(tsCol) > col(s"t${i}")
          window match {
            case Some(win) => after && col(tsCol) <= col("t1") + lit(win)
            case None      => after
          }
        }
      df.withColumn(s"t${i + 1}", min(when(cond, col(tsCol))).over(w))
    }
    // Build shallow-to-deep so the final expression tests the DEEPEST step
    // first (each later fold wraps the previous as its otherwise-branch).
    val depth = steps.indices.foldLeft(lit(0)) { (acc, i) =>
      when(col(s"t${i + 1}").isNotNull, lit(i + 1)).otherwise(acc)
    }
    withTimes
      .where(col("t1").isNotNull)
      .groupBy(entityCol)
      .agg(
        min("t1").as("t1"),
        (2 to steps.size).map(i => min(s"t$i").as(s"t$i")) :+
          min(depth).as("depth"): _*)
  }
}
