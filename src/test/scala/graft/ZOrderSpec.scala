package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ZOrder

/** Morton-key correctness and the clustering effect it exists for. */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("known interleaves") {
    val got = Seq((0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L), (2L, 3L))
      .toDF("x", "y")
      .select(ZOrder.zValue2(col("x"), col("y")).as("z"))
      .as[Long].collect().toSeq
    assert(got == Seq(0L, 1L, 2L, 3L, 14L))
  }

  test("magic-number fast path equals the generic bit-loop form") {
    val df = spark.range(500).select(
      (col("id") * 2654435761L % 2147483647L).as("x"),
      (col("id") * 40503L % 2147483647L).as("y"))
    val diff = df.select(
        ZOrder.zValue2(col("x"), col("y")).as("fast"),
        ZOrder.zValueN(Seq(col("x"), col("y")), 31).as("gen"))
      .where(col("fast") =!= col("gen")).count()
    assert(diff == 0)
  }

  test("three-dimension generic interleave round-trips each dimension") {
    // deinterleave by re-extracting bits and compare
    val df = spark.range(200).select(
      (col("id") % 17).as("a"), (col("id") % 13).as("b"), (col("id") % 11).as("c"))
    val z = ZOrder.zValueN(Seq(col("a"), col("b"), col("c")), 5)
    val back = (0 until 5).map { bit =>
      shiftleft(shiftright(z, bit * 3).bitwiseAND(lit(1L)), bit)
    }.reduce(_ bitwiseOR _)
    assert(df.select((back === col("a")).as("ok")).where(!col("ok")).count() == 0)
  }

  /** Partitions whose (x, y) bounding box intersects the query box. */
  private def touched(df: DataFrame, x0: Long, x1: Long, y0: Long, y1: Long): Long =
    df.withColumn("pid", spark_partition_id())
      .groupBy("pid")
      .agg(min("x").as("mnx"), max("x").as("mxx"),
        min("y").as("mny"), max("y").as("mxy"))
      .where(col("mxx") >= x0 && col("mnx") <= x1 &&
        col("mxy") >= y0 && col("mny") <= y1)
      .count()

  test("z-order layout prunes 2-D range queries better than single-key sort") {
    // 64x64 uniform grid, 16 partitions; an 8x8 query box
    val grid = spark.range(64L * 64L).select(
      (col("id") % 64).as("x"), (col("id") / 64).as("y"))
    val zLayout = ZOrder.clusterBy2(grid, "x", "y", 16)
    val xLayout = grid.repartitionByRange(16, col("x"))
      .sortWithinPartitions("x")
    val zTouched = touched(zLayout, 8, 15, 8, 15)
    val xTouched = touched(xLayout, 8, 15, 8, 15)
    // x-sorted strips span all of y: every strip overlapping x in [8,15]
    // is touched; z-order confines the box to a couple of quadrants
    assert(zTouched < xTouched,
      s"z touched $zTouched, x-sort touched $xTouched")
    assert(zTouched <= 2)
  }
}
