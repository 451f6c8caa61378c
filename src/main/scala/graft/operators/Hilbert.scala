package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Hilbert-curve index for two-dimensional data clustering — the
  * stronger sibling of the Morton key ([[ZOrder]]): consecutive Hilbert
  * positions are always grid-adjacent (one Manhattan step), so
  * range-partitioning by `h` yields per-file bounding boxes without the
  * Morton curve's quadrant-boundary jumps — measurably tighter min/max
  * boxes for 2-D range pruning, which is why modern layout-clustering
  * engines moved from Z-order to Hilbert for their default curve.
  *
  * The classic bitwise walk (Hamilton's xy2d): from the top bit down,
  * pick the quadrant, add its sub-square offset `s^2 * q`, and
  * rotate/reflect the frame. Each of the `bits` steps is a handful of
  * integer CASE expressions over (x, y, d) — built here as a chain of
  * `withColumn` projections (NOT one nested Column: x and y are
  * referenced several times per step, and inlining would square the
  * expression tree per level; as separate projections Catalyst keeps
  * each step's values materialized once, all inside whole-stage
  * codegen). [[sqlSteps]] emits the same walk as an ANSI CTE chain so
  * the DuckDB oracle replays every step bit-for-bit.
  *
  * `bits = 31` covers keys to 2^31; max d = 4^31 - 1 < 2^63 stays in
  * BIGINT in both engines.
  */
object Hilbert {

  /** Append `out` = Hilbert index of (`xCol`, `yCol`) (each in
    * [0, 2^bits)). Narrow projections only — no shuffle, no UDF. */
  def withIndex(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 31, out: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits in [1, 31], got $bits")
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn("__hd", lit(0L))
    ((bits - 1) to 0 by -1).foreach { b =>
      val s = 1L << b
      val rx = col("__hx").bitwiseAND(lit(s)) =!= lit(0L)
      val ry = col("__hy").bitwiseAND(lit(s)) =!= lit(0L)
      // ((3*rx) xor ry) spelled as a CASE so both engines share one form
      val q = when(!ry && !rx, lit(0L)).when(!ry && rx, lit(3L))
        .when(ry && rx, lit(2L)).otherwise(lit(1L))
      val nx = when(ry, col("__hx"))
        .when(rx, lit(s - 1) - col("__hy")).otherwise(col("__hy"))
      val ny = when(ry, col("__hy"))
        .when(rx, lit(s - 1) - col("__hx")).otherwise(col("__hx"))
      cur = cur
        .withColumn("__hd", col("__hd") + lit(s * s) * q)
        .withColumn("__nx", nx)
        .withColumn("__ny", ny)
        .drop("__hx", "__hy")
        .withColumnRenamed("__nx", "__hx")
        .withColumnRenamed("__ny", "__hy")
    }
    cur.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** Reference single-point evaluation (spec ground truth). */
  def index(xIn: Long, yIn: Long, bits: Int = 31): Long = {
    var (x, y, d) = (xIn, yIn, 0L)
    var b = bits - 1
    while (b >= 0) {
      val s = 1L << b
      val rx = (x & s) != 0L
      val ry = (y & s) != 0L
      d += s * s * (if (!ry && !rx) 0L else if (!ry) 3L else if (rx) 2L else 1L)
      if (!ry) {
        val (nx, ny) = if (rx) (s - 1 - y, s - 1 - x) else (y, x)
        x = nx; y = ny
      }
      b -= 1
    }
    d
  }

  /** The same walk as SQL: CTE steps `h0 .. h<bits>` over columns
    * (x, y, d) with `payload` carried through; `from` seeds h0. The
    * caller selects from `h<bits>`, whose `d` is the Hilbert index. */
  def sqlSteps(bits: Int, xExpr: String, yExpr: String,
      payload: Seq[String], from: String): String = {
    val seed = s"h0 AS (SELECT ${(payload :+
      s"CAST($xExpr AS BIGINT) AS x" :+ s"CAST($yExpr AS BIGINT) AS y" :+
      "CAST(0 AS BIGINT) AS d").mkString(", ")} FROM $from)"
    val steps = ((bits - 1) to 0 by -1).zipWithIndex.map { case (b, i) =>
      val s = 1L << b
      val q = s"CASE WHEN (y & $s) = 0 AND (x & $s) = 0 THEN 0 " +
        s"WHEN (y & $s) = 0 THEN 3 WHEN (x & $s) <> 0 THEN 2 ELSE 1 END"
      val nx = s"CASE WHEN (y & $s) <> 0 THEN x " +
        s"WHEN (x & $s) <> 0 THEN ${s - 1} - y ELSE y END"
      val ny = s"CASE WHEN (y & $s) <> 0 THEN y " +
        s"WHEN (x & $s) <> 0 THEN ${s - 1} - x ELSE x END"
      s"h${i + 1} AS (SELECT ${(payload :+ s"$nx AS x" :+ s"$ny AS y" :+
        s"d + ${s * s} * ($q) AS d").mkString(", ")} FROM h$i)"
    }
    (seed +: steps).mkString(",\n")
  }

  /** Cluster `df` for 2-D pruning by range-partition + sort on the
    * Hilbert index (write-side twin of [[ZOrder.clusterBy2]]). */
  def clusterBy2(df: DataFrame, xCol: String, yCol: String,
      partitions: Int, bits: Int = 31): DataFrame =
    withIndex(df, xCol, yCol, bits, "__h")
      .repartitionByRange(partitions, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
}
