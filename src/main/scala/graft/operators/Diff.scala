package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the reconciliation operator: given two versions of a
  * keyed table, emit one row per key whose presence or payload changed,
  * labeled `added` / `removed` / `changed`.
  *
  * Shape at scale: ONE full-outer sort-merge join on the key columns;
  * payload comparison is a null-safe struct equality inside the join's
  * projection (no second pass, no hashing job). At 100 TB both sides
  * shuffle once on the key — the minimum possible for an exact diff —
  * and AQE handles the asymmetric case (a small delta against a big base
  * becomes a broadcast join on the delta side).
  */
object Diff {

  /** @return (keyCols..., change) for keys that differ; unchanged keys are
    *         absent. Payload = every non-key column present in BOTH sides
    *         (side-only columns count toward presence, not change).
    */
  def diff(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty)
    require(keyCols.forall(oldDf.columns.contains) &&
      keyCols.forall(newDf.columns.contains),
      s"key columns $keyCols must exist on both sides")
    val payload = oldDf.columns.filterNot(keyCols.contains)
      .filter(newDf.columns.contains).toSeq

    val o = oldDf.select((keyCols.map(col) :+
      struct(payload.map(col): _*).as("__po") :+ lit(true).as("__ino")): _*)
    val n = newDf.select((keyCols.map(col) :+
      struct(payload.map(col): _*).as("__pn") :+ lit(true).as("__inn")): _*)

    o.join(n, keyCols, "full_outer")
      .withColumn("change",
        when(col("__ino").isNull, lit("added"))
          .when(col("__inn").isNull, lit("removed"))
          .when(!(col("__po") <=> col("__pn")), lit("changed")))
      .where(col("change").isNotNull)
      .select((keyCols.map(col) :+ col("change")): _*)
  }

  /** Export the APPLY-ABLE change batch that transforms `oldDf` into
    * `newDf`: added/changed keys become `upsert` rows carrying the NEW
    * payload, removed keys become `delete` tombstones (payload null) —
    * the batch [[Upsert.applyChanges]] consumes, so the algebra closes:
    *
    *   `Upsert.applyChanges(v1, changeSet(v1, v2), ...) == v2`
    *
    * (spec-pinned in UpsertSpec for random snapshots). This is how a
    * pipeline ships a snapshot delta instead of the snapshot: compute
    * once, apply everywhere. Same single full-outer join as [[diff]];
    * every change row carries the constant `version` so a later batch
    * with a higher version supersedes it under LWW.
    *
    * @return `keyCols..., payloadCols..., op, v` — payload columns are
    *         the non-key columns present in BOTH sides, null on deletes
    */
  def changeSet(oldDf: DataFrame, newDf: DataFrame, keyCols: Seq[String],
                version: Long = 1L): DataFrame = {
    require(keyCols.nonEmpty)
    require(keyCols.forall(oldDf.columns.contains) &&
      keyCols.forall(newDf.columns.contains),
      s"key columns $keyCols must exist on both sides")
    val payload = oldDf.columns.filterNot(keyCols.contains)
      .filter(newDf.columns.contains).toSeq

    val o = oldDf.select((keyCols.map(col) :+
      struct(payload.map(col): _*).as("__po") :+ lit(true).as("__ino")): _*)
    val n = newDf.select((keyCols.map(col) :+
      struct(payload.map(col): _*).as("__pn") :+ lit(true).as("__inn")): _*)

    o.join(n, keyCols, "full_outer")
      .withColumn("op",
        when(col("__inn").isNull, lit("delete"))
          .when(col("__ino").isNull || !(col("__po") <=> col("__pn")),
            lit("upsert")))
      .where(col("op").isNotNull)
      .select(keyCols.map(col) ++
        payload.map(c => when(col("op") === "upsert", col(s"__pn.$c")).as(c)) ++
        Seq(col("op"), lit(version).as("v")): _*)
  }
}
