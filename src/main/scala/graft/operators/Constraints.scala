package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checking (the Deequ shape): each
  * rule evaluates to an exact integer-micros "actual" plus a satisfied
  * verdict against a minimum — `(constraint, actual_micros, satisfied)`.
  *
  * Scale shapes, by rule class:
  *  - row rules (predicates, completeness): ALL of them fuse into ONE
  *    aggregate pass over the table — adding a rule costs one aggregate
  *    buffer, not a scan;
  *  - uniqueness: one distinct-count aggregate per rule (exact — the
  *    Expand price; swap approx_count_distinct at fleet scale when 2%
  *    error is tolerable);
  *  - referential integrity: one left join per rule against the DISTINCT
  *    parent keys (AQE broadcasts dimension-sized parents).
  */
object Constraints {

  /** A row-local rule: fraction of rows satisfying `pred` must reach
    * `minMicros` (of 1e6). */
  final case class RowRule(name: String, pred: Column, minMicros: Long)

  private def verdict(name: String, actual: Column, minMicros: Long) =
    struct(lit(name).as("constraint"),
      actual.cast("long").as("actual_micros"),
      (actual >= minMicros).as("satisfied"))

  /** All row rules in one aggregate pass. */
  def rowRules(df: DataFrame, rules: Seq[RowRule]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) =>
        sum(when(r.pred, 1L).otherwise(0L)).as(s"__c$i")
      }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rules.zipWithIndex.map { case (r, i) =>
        verdict(r.name, expr(s"__c$i * 1000000 div __n"), r.minMicros)
      }: _*)).as("v"))
      .select("v.*")
  }

  /** Fraction of rows whose `cols` tuple is distinct (1e6 = unique). */
  def unique(df: DataFrame, name: String, cols: Seq[String],
      minMicros: Long = 1000000L): DataFrame =
    df.agg(count_distinct(struct(cols.map(col): _*)).as("__d"),
        count(lit(1)).as("__n"))
      .select(verdict(name, expr("__d * 1000000 div __n"), minMicros).as("v"))
      .select("v.*")

  /** Fraction of child rows whose key exists in the parent. */
  def fkCoverage(child: DataFrame, childCol: String, parent: DataFrame,
      parentCol: String, name: String,
      minMicros: Long = 1000000L): DataFrame = {
    val p = parent.select(col(parentCol).as("__pk")).distinct()
    child.select(col(childCol).as("__ck"))
      .join(p, col("__ck") === col("__pk"), "left")
      .agg(count(col("__pk")).as("__m"), count(lit(1)).as("__n"))
      .select(verdict(name, expr("__m * 1000000 div __n"), minMicros).as("v"))
      .select("v.*")
  }
}
