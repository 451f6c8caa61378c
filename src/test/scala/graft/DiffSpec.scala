package graft

import org.apache.spark.sql.functions.lit
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Diff

/** Snapshot-diff semantics: presence classes, payload comparison, nulls. */
class DiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(old: Seq[(Long, String, String)],
      nw: Seq[(Long, String, String)]): Map[Long, String] =
    Diff.diff(old.toDF("k", "a", "b"), nw.toDF("k", "a", "b"), Seq("k"))
      .collect()
      .map(r => r.getAs[Long]("k") -> r.getAs[String]("change"))
      .toMap

  test("classifies added, removed and changed; unchanged keys absent") {
    val got = run(
      old = Seq((1L, "x", "y"), (2L, "x", "y"), (3L, "x", "y")),
      nw = Seq((1L, "x", "y"), (2L, "x", "z"), (4L, "n", "n")))
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
  }

  test("null payloads compare null-safely") {
    val got = run(
      old = Seq((1L, null, "y"), (2L, null, "y")),
      nw = Seq((1L, null, "y"), (2L, "v", "y")))
    assert(got == Map(2L -> "changed"))
  }

  test("identical snapshots produce an empty diff") {
    val rows = Seq((1L, "a", "b"), (2L, "c", null))
    assert(run(rows, rows).isEmpty)
  }

  test("side-only columns count toward presence, not change") {
    val old = Seq((1L, "x")).toDF("k", "a").withColumn("old_only", lit("o"))
    val nw = Seq((1L, "x")).toDF("k", "a")
    assert(Diff.diff(old, nw, Seq("k")).count() == 0)
  }

  test("composite keys") {
    val old = Seq((1L, "p", "v1"), (1L, "q", "v1")).toDF("k1", "k2", "p")
    val nw = Seq((1L, "p", "v1"), (1L, "q", "v2")).toDF("k1", "k2", "p")
    val got = Diff.diff(old, nw, Seq("k1", "k2")).collect()
      .map(r => (r.getAs[Long]("k1"), r.getAs[String]("k2"),
        r.getAs[String]("change")))
    assert(got.toSeq == Seq((1L, "q", "changed")))
  }
}
