package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Funnel

/** Earliest-completion funnel semantics and plan shape. */
class FunnelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Steps = Seq("a", "b", "c")

  private def run(rows: Seq[(Long, String, Long)], window: Option[Long] = None) =
    Funnel.earliestCompletion(
        rows.toDF("u", "event_type", "ts"), "u", "ts", "event_type",
        Steps, window)
      .collect()
      .map(r => r.getAs[Long]("u") ->
        ((Option(r.getAs[Any]("t1")), Option(r.getAs[Any]("t2")),
          Option(r.getAs[Any]("t3"))), r.getAs[Int]("depth")))
      .toMap

  test("full completion takes the earliest valid chain") {
    val got = run(Seq(
      (1L, "a", 10L), (1L, "a", 5L), (1L, "b", 7L), (1L, "b", 20L),
      (1L, "c", 25L)))
    // t1 = min(a) = 5; the b at 7 is after 5 so t2 = 7 (not 20); c at 25.
    assert(got(1L) == ((Some(5L), Some(7L), Some(25L)), 3))
  }

  test("steps must be strictly after the previous step") {
    val got = run(Seq((1L, "a", 10L), (1L, "b", 10L), (1L, "c", 11L)))
    // b at the same instant as t1 does not count.
    assert(got(1L) == ((Some(10L), None, None), 1))
  }

  test("out-of-order steps do not complete the funnel") {
    val got = run(Seq((1L, "c", 1L), (1L, "b", 2L), (1L, "a", 3L)))
    assert(got(1L) == ((Some(3L), None, None), 1))
  }

  test("conversion window is measured from step 1") {
    val events = Seq(
      (1L, "a", 0L), (1L, "b", 50L), (1L, "c", 120L),
      (2L, "a", 0L), (2L, "b", 150L), (2L, "c", 160L))
    val got = run(events, window = Some(100L))
    assert(got(1L) == ((Some(0L), Some(50L), None), 2)) // c past the window
    assert(got(2L) == ((Some(0L), None, None), 1)) // b already past
  }

  test("entities that never reach step 1 are absent") {
    val got = run(Seq((1L, "b", 1L), (1L, "c", 2L), (2L, "a", 1L)))
    assert(!got.contains(1L) && got(2L) == ((Some(1L), None, None), 1))
  }

  test("a deep funnel still plans exactly one shuffle") {
    val df = Funnel.earliestCompletion(
      Seq((1L, "a", 1L)).toDF("u", "event_type", "ts"),
      "u", "ts", "event_type", Seq("a", "b", "c", "d", "e"))
    // The executed plan is AQE-wrapped; count exchanges in the rendered
    // initial plan (collect() does not traverse into AdaptiveSparkPlanExec).
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, plan)
  }
}
