package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Scd2

/** SCD2 history semantics: interval chaining, no-op collapse, ties. */
class Scd2Spec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, String)], dropNoOps: Boolean = true) =
    Scd2.history(rows.toDF("k", "id", "v", "state"),
        Seq("k"), "v", Seq("id"), Seq("state"), dropNoOps)
      .collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("state"),
        r.getAs[Long]("valid_from"), Option(r.getAs[Any]("valid_to")),
        r.getAs[Boolean]("is_current")))
      .sortBy(t => (t._1, t._3))

  test("intervals chain and the last row is current") {
    val got = run(Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "b"), (1L, 3L, 30L, "c")))
    assert(got.toSeq == Seq(
      (1L, "a", 10L, Some(20L), false),
      (1L, "b", 20L, Some(30L), false),
      (1L, "c", 30L, None, true)))
  }

  test("consecutive identical states collapse to one interval") {
    val got = run(Seq(
      (1L, 1L, 10L, "a"), (1L, 2L, 20L, "a"), (1L, 3L, 30L, "b"),
      (1L, 4L, 40L, "a")))
    // a@10..30 (the no-op at 20 dropped), b@30..40, a@40..
    assert(got.toSeq == Seq(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true)))
  }

  test("dropNoOps=false keeps every change row") {
    val got = run(Seq((1L, 1L, 10L, "a"), (1L, 2L, 20L, "a")), dropNoOps = false)
    assert(got.size == 2 && got(0)._4 == Some(20L))
  }

  test("equal versions break ties by the tie column") {
    val got = run(Seq((1L, 2L, 10L, "b"), (1L, 1L, 10L, "a")))
    // id 1 (state a) precedes id 2 (state b) at the same version
    assert(got.map(_._2).toSeq == Seq("a", "b"))
    assert(got.last._5) // b is current
  }

  test("keys are independent") {
    val got = run(Seq((1L, 1L, 10L, "a"), (2L, 2L, 5L, "x")))
    assert(got.count(_._5) == 2)
  }

  test("the whole operator plans exactly one shuffle") {
    val df = Scd2.history(
      Seq((1L, 1L, 10L, "a")).toDF("k", "id", "v", "state"),
      Seq("k"), "v", Seq("id"), Seq("state"))
    val plan = df.queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, plan)
  }
}
