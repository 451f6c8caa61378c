package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Constraints

/** Constraint-suite semantics: fused row rules, uniqueness, FK coverage. */
class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def verdicts(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[String]("constraint") ->
      ((r.getAs[Long]("actual_micros"), r.getAs[Boolean]("satisfied")))).toMap

  test("row rules share one aggregate pass and report exact fractions") {
    val df = Seq((1L, Some(10L)), (2L, None), (3L, Some(-1L)), (4L, Some(5L)))
      .toDF("id", "v")
    val got = verdicts(Constraints.rowRules(df, Seq(
      Constraints.RowRule("complete", col("v").isNotNull, 1000000L),
      Constraints.RowRule("positive", col("v") > 0, 500000L))))
    assert(got("complete") == ((750000L, false)))
    assert(got("positive") == ((500000L, true)))
    // one aggregate: a single scan feeds both rules
    val plan = Constraints.rowRules(df, Seq(
      Constraints.RowRule("a", col("v").isNotNull, 1L),
      Constraints.RowRule("b", col("v") > 0, 1L)))
      .queryExecution.optimizedPlan.toString
    assert("LocalRelation|Relation".r.findAllIn(plan).size == 1, plan)
  }

  test("uniqueness is exact and fails on duplicates") {
    val df = Seq(1L, 2L, 2L, 3L).toDF("k")
    val got = verdicts(Constraints.unique(df, "pk", Seq("k")))
    assert(got("pk") == ((750000L, false)))
    val ok = verdicts(Constraints.unique(Seq(1L, 2L).toDF("k"), "pk", Seq("k")))
    assert(ok("pk") == ((1000000L, true)))
  }

  test("fk coverage counts matched child rows, duplicates in parent ignored") {
    val child = Seq(1L, 2L, 3L, 9L).toDF("ck")
    val parent = Seq(1L, 1L, 2L, 3L).toDF("pk")
    val got = verdicts(Constraints.fkCoverage(child, "ck", parent, "pk", "fk"))
    assert(got("fk") == ((750000L, false)))
  }
}
