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
  * rotate/reflect the frame. The column form is the native
  * [[graft.functions.HilbertIndex]] expression — the walk carries
  * (x, y, d) state through `bits` steps referencing x/y several times
  * each, and BOTH declarative spellings fail at bits = 31: one nested
  * Column squares the expression tree per level, and a chain of
  * per-step projections (tried first) generates code past the
  * whole-stage-codegen method limits and drops the plan to interpreted
  * evaluation (measured 15.5 s vs 1.0 s for 600k rows). The expression
  * compiles to one tight loop invoked from generated code.
  * [[sqlSteps]] emits the same walk as an ANSI CTE chain so the DuckDB
  * oracle replays every step bit-for-bit.
  *
  * `bits = 31` covers keys to 2^31; max d = 4^31 - 1 < 2^63 stays in
  * BIGINT in both engines.
  */
object Hilbert {

  /** Append `out` = Hilbert index of (`xCol`, `yCol`) (each in
    * [0, 2^bits)). One codegen'd expression — no shuffle, no UDF. */
  def withIndex(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 31, out: String = "h"): DataFrame = {
    require(bits >= 1 && bits <= 31, s"bits in [1, 31], got $bits")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val e = graft.functions.HilbertIndex(
      ColumnBridge.expression(col(xCol).cast("long")),
      ColumnBridge.expression(col(yCol).cast("long")),
      ColumnBridge.expression(lit(bits)))
    df.withColumn(out, ColumnBridge.column(e))
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
