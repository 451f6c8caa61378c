package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed change application (the MERGE / CDC-apply primitive): fold a
  * batch of versioned upsert/delete changes into a base snapshot and
  * emit the next snapshot. Completes the table-maintenance triad —
  * [[Diff]] derives a change set between snapshots, [[Scd2]] historizes
  * a change log, and this operator MATERIALIZES a change log onto the
  * current state, which is what a 100 TB pipeline actually runs every
  * ingest cycle (apply today's crawl delta / takedown list to the
  * corpus snapshot).
  *
  * Semantics: per key, the WINNING change is the one with the greatest
  * `(versionCol, tieCols...)` (last-writer-wins; ties must be broken by
  * `tieCols` if versions can collide — same contract as [[Scd2]]).
  *   - winner is an upsert -> the winner's payload replaces (or
  *     inserts) the row;
  *   - winner is a delete  -> the key is dropped (a tombstone for an
  *     absent key is a no-op, so replayed/duplicated tombstones are
  *     idempotent);
  *   - no change for the key -> the base row carries over unchanged.
  * Applying the same change batch twice yields the same snapshot
  * (idempotence), and `applyChanges(applyChanges(s, b1), b2)` equals
  * applying the concatenation when version order is global — the
  * replay/backfill property every CDC consumer relies on.
  *
  * Shape at scale: winner selection is a window over the CHANGE BATCH
  * only (one exchange of the delta, never the base); the fold is one
  * full-outer hash join on the key — the base's single exchange, which
  * disappears entirely when the base is bucketed by the key
  * (sources/Bucketed) since the delta is re-partitioned to match. No
  * driver state, no collect; delete is a filter, not a second pass.
  */
object Upsert {

  /** @param base        current snapshot: `keyCols ++ payloadCols`
    * @param changes     change batch: `keyCols ++ payloadCols ++
    *                    (opCol, versionCol, tieCols...)`; payload values
    *                    on delete rows are ignored
    * @param keyCols     entity identity
    * @param payloadCols tracked state columns
    * @param opCol       string column: "upsert" | "delete"
    * @param versionCol  orderable change time
    * @param tieCols     deterministic tie-break within equal versions
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      payloadCols: Seq[String],
      opCol: String,
      versionCol: String,
      tieCols: Seq[String] = Nil): DataFrame = {
    require(keyCols.nonEmpty && payloadCols.nonEmpty)
    val ops = Set("upsert", "delete")
    val order = (versionCol +: tieCols).map(c => col(c).desc)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)
    val winners = changes
      .where(col(opCol).isin(ops.toSeq: _*))
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") === 1)
      .select((keyCols.map(col) :+ col(opCol).as("__op")) ++
        payloadCols.map(c => col(c).as(s"__w_$c")): _*)

    base.join(winners, keyCols, "full_outer")
      .where(col("__op").isNull || col("__op") =!= "delete")
      .select(keyCols.map(col) ++ payloadCols.map { c =>
        when(col("__op") === "upsert", col(s"__w_$c")).otherwise(col(c)).as(c)
      }: _*)
  }
}
