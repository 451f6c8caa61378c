package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

/** As-of join semantics: latest right row at-or-before each left row. */
class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]) = {
    val l = left.toDF("k", "id", "t")
    val r = right.toDF("k", "t", "v")
    AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v"))
      .collect()
      .map(row => row.getAs[Long]("id") ->
        Option(row.getAs[Any]("v")).map(_.asInstanceOf[Long]))
      .toMap
  }

  test("picks the latest right row at or before each left timestamp") {
    val got = run(
      left = Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 30L)),
      right = Seq((1L, 5L, 100L), (1L, 15L, 200L), (1L, 25L, 300L)))
    assert(got == Map(1L -> Some(100L), 2L -> Some(200L), 3L -> Some(300L)))
  }

  test("left rows before any right row get null payload") {
    val got = run(left = Seq((1L, 1L, 3L)), right = Seq((1L, 5L, 100L)))
    assert(got == Map(1L -> None))
  }

  test("equal timestamps: the same-instant right row is visible") {
    val got = run(left = Seq((1L, 1L, 10L)), right = Seq((1L, 10L, 100L)))
    assert(got == Map(1L -> Some(100L)))
  }

  test("keys never mix") {
    val got = run(
      left = Seq((1L, 1L, 10L), (2L, 2L, 10L)),
      right = Seq((1L, 5L, 100L)))
    assert(got == Map(1L -> Some(100L), 2L -> None))
  }

  test("a matched right row with NULL payload value wins (no older-value leak)") {
    import org.apache.spark.sql.functions._
    val l = Seq((1L, 1L, 10L)).toDF("k", "id", "t")
    val r = Seq((1L, 1L, Some(100L)), (1L, 5L, None))
      .toDF("k", "t", "v")
    val got = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("v")).head()
    // the t=5 row is the as-of match; its NULL value must be returned,
    // not the older t=1 value 100 (DuckDB ASOF semantics)
    assert(got.isNullAt(got.fieldIndex("v")))
  }

  test("multiple payload columns never mix values across right rows") {
    val l = Seq((1L, 1L, 10L)).toDF("k", "id", "t")
    val r = Seq((1L, 2L, Some(20L), None: Option[Long]),
                (1L, 8L, None: Option[Long], Some(80L)))
      .toDF("k", "t", "a", "b")
    val got = AsOfJoin.asOf(l, r, Seq("k"), "t", "t", Seq("a", "b")).head()
    // match is the t=8 row: a NULL, b 80 — never (a=20, b=80) mixed
    assert(got.isNullAt(got.fieldIndex("a")))
    assert(got.getAs[Long]("b") == 80L)
  }
}
