package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.FuzzyJoin

/** Symmetric-deletion fuzzy join: completeness vs the naive quadratic
  * join, and edit-class coverage. */
class FuzzyJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(rows: Seq[(Long, String)], d: Int): Set[(Long, Long, Long)] =
    FuzzyJoin.selfJoin(rows.toDF("id", "s"), "id", "s", d)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("distance")))
      .toSet

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1)(i => Array.tabulate(b.length + 1) {
      j => if (i == 0) j else if (j == 0) i else 0
    })
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j), dp(i)(j - 1)) + 1,
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  test("covers substitutions, insertions and deletions") {
    val rows = Seq(1L -> "widget", 2L -> "widgit", 3L -> "widgets",
      4L -> "idget", 5L -> "gadget")
    val got = run(rows, 1)
    assert(got.map(t => (t._1, t._2)) ==
      Set((1L, 2L), (1L, 3L), (1L, 4L)))
  }

  test("d = 0 finds exactly the duplicate strings") {
    val got = run(Seq(1L -> "a b", 2L -> "a b", 3L -> "ab"), 0)
    assert(got == Set((1L, 2L, 0L)))
  }

  test("complete vs the naive quadratic join on pseudo-random short strings") {
    val alphabet = "abc"
    val rows = (0 until 120).map { i =>
      val n = 3 + (i * 7) % 5
      val s = (0 until n).map(j => alphabet(((i + 1) * (j + 3) * 2654435761L % 3).toInt)).mkString
      (i.toLong, s)
    }
    for (d <- 0 to 2) {
      val naive = (for {
        (ia, sa) <- rows; (ib, sb) <- rows
        if ia < ib && lev(sa, sb) <= d
      } yield (ia, ib, lev(sa, sb).toLong)).toSet
      assert(run(rows, d) == naive, s"d=$d")
    }
  }

  test("rejects unsupported distances") {
    intercept[IllegalArgumentException] {
      FuzzyJoin.selfJoin(Seq((1L, "x")).toDF("id", "s"), "id", "s", 3)
    }
  }
}
