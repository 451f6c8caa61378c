package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Blocklist

/** Aho-Corasick blocklist: automaton correctness vs a brute-force
  * position scan (randomized), overlap/fail-link cases, operator shape. */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Ground truth: occurrences = number of start positions. */
  private def brute(text: String, p: String): Long =
    (0 to text.length - p.length).count(i => text.regionMatches(i, p, 0, p.length)).toLong

  test("automaton counts every start position, overlaps included") {
    val pats = Seq("aa", "aaa", "ab")
    val ac = new Blocklist.Automaton(pats)
    val hits = ac.countMatches("aaaab")
    // "aaaab": aa at 0,1,2; aaa at 0,1; ab at 3
    assert(hits.toSeq == Seq(3L, 2L, 1L))
  }

  test("fail links cross pattern families (suffix of one is prefix of another)") {
    val ac = new Blocklist.Automaton(Seq("his", "she", "hers"))
    assert(ac.countMatches("ushers").toSeq == Seq(0L, 1L, 1L))
    // "shis": walking 'sh' then failing into "his"
    assert(ac.countMatches("shis").toSeq == Seq(1L, 0L, 0L))
  }

  test("automaton equals brute force on random texts and patterns") {
    val rnd = new scala.util.Random(42)
    (1 to 25).foreach { _ =>
      val alphabet = "abc"
      val pats = (1 to 5).map(_ =>
        (1 to (1 + rnd.nextInt(4))).map(_ => alphabet(rnd.nextInt(3))).mkString)
        .distinct
      val text = (1 to 200).map(_ => alphabet(rnd.nextInt(3))).mkString
      val ac = new Blocklist.Automaton(pats)
      val got = ac.countMatches(text).toSeq
      val want = pats.map(p => brute(text, p))
      assert(got == want, s"patterns $pats")
    }
  }

  test("screen flags documents case-insensitively with zero shuffles") {
    val docs = Seq(
      (1L, "The TABLE part is here"),
      (2L, "nothing to see"),
      (3L, "table table part")).toDF("doc_id", "text")
    val out = Blocklist.screen(docs, Seq("table", "table part"))
    val got = out.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) == ((2L, 2L, true)))  // "table" + "table part"
    assert(got(2L) == ((0L, 0L, false)))
    assert(got(3L) == ((3L, 2L, true)))  // table x2, table part x1
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("NULL text screens all-zero / not-blocked (every doc gets a " +
      "verdict; the oracle's CASE on NULL length does the same)") {
    val docs = Seq((1L, "has a table"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = Blocklist.screen(docs, Seq("table"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(got(1L) == ((1L, 1L, true)))
    assert(got(2L) == ((0L, 0L, false)))
  }

  test("empty pattern set is rejected") {
    intercept[IllegalArgumentException] { new Blocklist.Automaton(Nil) }
    intercept[IllegalArgumentException] { new Blocklist.Automaton(Seq("")) }
  }
}
