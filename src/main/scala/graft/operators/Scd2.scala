package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 history construction: turn an ordered
  * change log into effective-dated state rows
  * `(key, payload, valid_from, valid_to, is_current)`.
  *
  * Semantics: changes are ordered per key by (versionCol, tieCols...);
  * each change opens an interval at its version and the NEXT change
  * closes it (`valid_to` null on the latest = current row). With
  * `dropNoOps`, a change whose payload equals the immediately preceding
  * payload is discarded BEFORE intervals are computed, so runs of
  * identical states collapse into one interval — the standard CDC
  * compaction.
  *
  * Shape at scale: everything is per-key window work over ONE
  * `partitionBy(keys)` exchange (the no-op lag filter and the valid_to
  * lead share the same partitioning and sort, so Catalyst plans a single
  * shuffle + sort for the whole operator). No joins, no driver state.
  */
object Scd2 {

  /** @param changes    change log, one row per state observation
    * @param keyCols    entity identity
    * @param versionCol orderable effective time of the change
    * @param tieCols    deterministic tie-break within equal versions
    *                   (e.g. a change id); required non-empty if versions
    *                   can collide
    * @param payloadCols the tracked state columns
    * @param dropNoOps  collapse consecutive identical payloads
    */
  def history(
      changes: DataFrame,
      keyCols: Seq[String],
      versionCol: String,
      tieCols: Seq[String],
      payloadCols: Seq[String],
      dropNoOps: Boolean = true): DataFrame = {
    require(keyCols.nonEmpty && payloadCols.nonEmpty)
    val order = (versionCol +: tieCols).map(col)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(order: _*)

    val payloadStruct = struct(payloadCols.map(col): _*)
    val deduped =
      if (dropNoOps)
        changes
          .withColumn("__prev", lag(payloadStruct, 1).over(w))
          // first change per key has null __prev and is always kept
          .where(col("__prev").isNull || col("__prev") =!= payloadStruct)
          .drop("__prev")
      else changes

    deduped
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
      .select((keyCols ++ payloadCols ++
        Seq("valid_from", "valid_to", "is_current")).map(col): _*)
  }
}
