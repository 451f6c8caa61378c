package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IncrementalAgg

/** Incremental aggregate maintenance: the merge invariant, key coverage
  * on both join sides, multi-step refresh chains, exactness. */
class IncrementalAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rows(r: (String, Double)*) = r.toDF("k", "v")

  private def canon(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSet

  test("merge(agg(A), agg(B)) == agg(A union B) exactly") {
    val a = rows("x" -> 1.25, "x" -> 2.5, "y" -> -3.75)
    val b = rows("x" -> 0.125, "z" -> 10.0)
    val merged = IncrementalAgg.merge(
      IncrementalAgg.aggregate(a, Seq("k"), "v"),
      IncrementalAgg.aggregate(b, Seq("k"), "v"), Seq("k"))
    val full = IncrementalAgg.aggregate(a.union(b), Seq("k"), "v")
    assert(canon(merged) == canon(full))
  }

  test("delta-only and base-only keys both survive the full-outer merge") {
    val base = IncrementalAgg.aggregate(rows("only_base" -> 1.0), Seq("k"), "v")
    val out = IncrementalAgg.refresh(base,
      rows("only_delta" -> 2.0), Seq("k"), "v")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("only_base" -> 1L, "only_delta" -> 1L))
  }

  test("a chain of refreshes equals one recompute (append-only ingest)") {
    val batches = (0 until 4).map(i =>
      rows((s"k${i % 2}", i * 1.5), (s"k${(i + 1) % 3}", -i * 0.25)))
    val chained = batches.tail.foldLeft(
      IncrementalAgg.aggregate(batches.head, Seq("k"), "v")) {
      (acc, d) => IncrementalAgg.refresh(acc, d, Seq("k"), "v")
    }
    val full = IncrementalAgg.aggregate(
      batches.reduce(_ union _), Seq("k"), "v")
    assert(canon(chained) == canon(full))
  }

  test("state components are exact integers (micros sums and extremes)") {
    val out = IncrementalAgg.aggregate(
      rows("k" -> 0.1, "k" -> 0.2), Seq("k"), "v").head()
    // 0.1 + 0.2 in doubles drifts; per-row decimal micros do not
    assert(out.getAs[Long]("sum_micros") == 300000L)
    assert(out.getAs[Long]("min_micros") == 100000L)
    assert(out.getAs[Long]("max_micros") == 200000L)
  }

  test("rounding convention pin: sum rounds half-away-from-zero, " +
      "extremes floor — a value where floor/truncate/round all disagree") {
    // v = -2.5e-6: v*1e6 = -2.5 exactly in doubles.
    //   half-away-from-zero (the DECIMAL(38,0) cast, both engines) -> -3
    //   floor -> -3, truncate -> -2
    // v = 2.5e-6: v*1e6 = 2.5 -> round 3, floor 2, truncate 2.
    val out = IncrementalAgg.aggregate(
      rows("k" -> 2.5e-6, "k" -> -2.5e-6), Seq("k"), "v").head()
    assert(out.getAs[Long]("sum_micros") == 0L) // 3 + (-3); truncation would give 0 too, but floor gives -1
    assert(out.getAs[Long]("min_micros") == -3L) // floor(-2.5); truncate would give -2
    assert(out.getAs[Long]("max_micros") == 2L)  // floor(2.5); rounding would give 3
    // isolate the positive row so the sum pin distinguishes round vs floor
    val pos = IncrementalAgg.aggregate(rows("k" -> 2.5e-6), Seq("k"), "v").head()
    assert(pos.getAs[Long]("sum_micros") == 3L) // round; floor/truncate give 2
  }
}
