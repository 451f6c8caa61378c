package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values for multi-dimensional data clustering.
  *
  * Sorting/range-partitioning a table by `zValue` of its filter columns
  * keeps rows that are close in EVERY dimension close in the layout, so
  * per-file min/max statistics become tight boxes and a 2-D range
  * predicate prunes most files — the standard data-layout trick for
  * multi-dimensional scan pruning at 100 TB (a plain sort by x gives
  * perfect x-pruning and zero y-pruning).
  *
  * `zValue2` interleaves two 32-bit dimensions into one 64-bit key with
  * the five magic-number spread steps — all codegen'd long bit ops, no
  * UDF. `zValueN` is the general form (any #dims, `dims * bits <= 63`)
  * built from the same primitives; on inputs below 2^31, `zValue2` ==
  * `zValueN(_, _, 31)` bit for bit on the low 62 bits (ZOrderSpec pins
  * the agreement at 31 bits — `zValueN(2, 32)` itself exceeds the
  * 63-bit budget and is rejected).
  */
object ZOrder {

  /** Spread the low 32 bits of `x` to even bit positions (0, 2, 4, ...).
    * Input widened to long first — int columns would shift in 32 bits. */
  private def spread2(xIn: Column): Column = {
    val x = xIn.cast("long")
    val m1 = lit(0x0000FFFF0000FFFFL)
    val m2 = lit(0x00FF00FF00FF00FFL)
    val m3 = lit(0x0F0F0F0F0F0F0F0FL)
    val m4 = lit(0x3333333333333333L)
    val m5 = lit(0x5555555555555555L)
    val s1 = (x.bitwiseOR(shiftleft(x, 16))).bitwiseAND(m1)
    val s2 = (s1.bitwiseOR(shiftleft(s1, 8))).bitwiseAND(m2)
    val s3 = (s2.bitwiseOR(shiftleft(s2, 4))).bitwiseAND(m3)
    val s4 = (s3.bitwiseOR(shiftleft(s3, 2))).bitwiseAND(m4)
    (s4.bitwiseOR(shiftleft(s4, 1))).bitwiseAND(m5)
  }

  /** Morton key of two non-negative dimensions (each < 2^31); `x` takes
    * the even bits, `y` the odd. */
  def zValue2(x: Column, y: Column): Column =
    spread2(x).bitwiseOR(shiftleft(spread2(y), 1))

  /** General Morton key: `bits` bits per dimension, dimension d at bit
    * positions d, d+n, d+2n, ... Built as a sum of single-bit extracts —
    * slower than the magic-number path but works for any arity. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(dims.nonEmpty && bits > 0 && dims.size * bits <= 63,
      s"need dims*bits <= 63, got ${dims.size} x $bits")
    val n = dims.size
    val terms = for {
      (d, di) <- dims.zipWithIndex
      b <- 0 until bits
    } yield shiftleft(shiftright(d.cast("long"), b).bitwiseAND(lit(1L)), b * n + di)
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` for multi-dimensional pruning: range-partition + sort by
    * the Morton key of `xCol`/`yCol` (the write-side half of the trick;
    * parquet row-group stats do the read-side pruning). */
  def clusterBy2(df: DataFrame, xCol: String, yCol: String,
      partitions: Int): DataFrame = {
    val z = zValue2(col(xCol), col(yCol)).as("__z")
    df.withColumn("__z", z)
      .repartitionByRange(partitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
