package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Histogram

/** Equi-depth histogram: rank-statistic bounds, tie collapse, totals. */
class HistogramSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hist(k: Int, rows: (String, Double)*) =
    Histogram.equiDepth(rows.toDF("g", "v"), Seq("g"), "v", k)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3))).toMap

  test("uniform values split into equal-depth buckets at exact rank bounds") {
    val h = hist(4, (1 to 8).map(i => "a" -> i.toDouble): _*)
    // bounds at ranks 2, 4, 6, 8 -> values 2, 4, 6, 8
    assert(h == Map(
      ("a", 1L) -> (2000000L, 2L), ("a", 2L) -> (4000000L, 2L),
      ("a", 3L) -> (6000000L, 2L), ("a", 4L) -> (8000000L, 2L)))
  }

  test("heavy ties collapse into the boundary-owning bucket, leaving " +
      "empty buckets between equal bounds") {
    val h = hist(2, Seq.fill(4)("a" -> 1.0): _*)
    assert(h == Map(("a", 1L) -> (1000000L, 4L), ("a", 2L) -> (1000000L, 0L)))
  }

  test("bucket counts sum to the group size; groups are isolated") {
    val rows = (1 to 23).map(i => "a" -> (i * 1.5)) ++
      (1 to 7).map(i => "b" -> (100.0 - i))
    val h = hist(5, rows: _*)
    assert(h.keys.count(_._1 == "a") == 5 && h.keys.count(_._1 == "b") == 5)
    assert(h.collect { case (("a", _), (_, n)) => n }.sum == 23L)
    assert(h.collect { case (("b", _), (_, n)) => n }.sum == 7L)
    // bounds are non-decreasing in bucket order
    Seq("a", "b").foreach { g =>
      val bs = (1 to 5).map(i => h((g, i.toLong))._1)
      assert(bs == bs.sorted)
    }
    // equi-depth: every bucket within ceil(n/k) of the ideal depth
    assert(h.collect { case (("a", _), (_, n)) => n }.forall(n => n >= 3 && n <= 6))
  }

  test("non-divisible n/k puts bounds at true ceil(i*n/k) ranks") {
    // n=5, k=2: bounds at ranks ceil(2.5)=3 and ceil(5)=5 -> values 3, 5.
    // The pre-r9 floor spelling put the first bound at rank 2 (value 2),
    // mislabeling the histogram as documented-ceil while computing floor.
    val h = hist(2, (1 to 5).map(i => "a" -> i.toDouble): _*)
    assert(h == Map(("a", 1L) -> (3000000L, 3L), ("a", 2L) -> (5000000L, 2L)))
  }

  test("groups smaller than k still produce all k buckets (no silent " +
      "vanishing at rank 0)") {
    // n=3 < k=8: ceil(i*3/8) ranges over 1..3, every bucket matches a
    // row. The floor spelling sent buckets 1-2 to rank 0 (no match) and
    // they vanished, violating the (bucket (1..k)) contract.
    val h = hist(8, Seq("a" -> 10.0, "a" -> 20.0, "a" -> 30.0): _*)
    assert(h.keys.map(_._2).toSet == (1L to 8L).toSet, h)
    assert(h.collect { case (("a", _), (_, n)) => n }.sum == 3L)
    // bounds non-decreasing, last bound is the max value
    val bs = (1 to 8).map(i => h(("a", i.toLong))._1)
    assert(bs == bs.sorted && bs.last == 30000000L)
  }

  test("range selectivity reads off the histogram within one bucket depth") {
    val rows = (1 to 100).map(i => "a" -> i.toDouble)
    val h = hist(10, rows: _*)
    // estimate #values <= 42: full buckets with hi <= 42 plus at most one
    val cumBelow = h.collect { case (("a", _), (hi, n)) if hi <= 42000000L => n }.sum
    assert(math.abs(cumBelow - 42L) <= 10L) // within one bucket depth
  }

  test("exact bounds come from ONE hash-join pass over the ranked " +
      "relation (no nested-loop fan-out of k filter passes)") {
    val df = (1 to 50).map(i => ("a", i * 1.1)).toDF("g", "v")
    // the bounds subplan is materialized inside equiDepth; pin the shape
    // by rebuilding its un-checkpointed equivalent: rank window joined
    // to broadcast target ranks must plan as BroadcastHashJoin, never
    // the BroadcastNestedLoopJoin the crossJoin(range(k)) spelling made
    val out = Histogram.equiDepth(df, Seq("g"), "v", 4)
    out.collect() // force the internal checkpoint + plan
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"), plan)
  }

  test("equiDepthApprox equals the exact tier under the exactness " +
      "contract (accuracy > n, power-of-two k), with no window over " +
      "the fact table") {
    // skewed + tied + negative values, non-divisible n/k, two groups
    val rows = ((1 to 37).map(i => "a" -> (i % 7) * 1.5) ++
      (1 to 11).map(i => "b" -> (-i * 0.3))).toDF("g", "v")
    for (k <- Seq(2, 4, 8)) {
      val exact = Histogram.equiDepth(rows, Seq("g"), "v", k)
        .collect().map(_.toSeq).toSet
      val approx = Histogram.equiDepthApprox(rows, Seq("g"), "v", k,
        accuracy = 1 << 16)
      assert(approx.collect().map(_.toSeq).toSet == exact, s"k=$k")
      val plan = approx.queryExecution.executedPlan.toString
      // the lag over the k-row boundary relation remains; what must NOT
      // appear is a rank window (the per-group fact-table sort)
      assert(!plan.contains("row_number"), s"k=$k:\n$plan")
    }
  }
}
