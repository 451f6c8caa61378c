package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Search

/** BM25 ranking semantics (rational-idf variant, exact BIGINT scoring). */
class SearchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def topk(docs: Seq[(Long, String)], terms: Seq[String], k: Int = 10) =
    Search.bm25TopK(docs.toDF("doc_id", "text"), "doc_id", "text",
        Seq(0L -> terms), k)
      .orderBy("rk")
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("score_micros")))

  test("higher tf ranks higher, with diminishing (saturating) returns") {
    val got = topk(Seq(
      (1L, "cat dog dog dog"),
      (2L, "cat dog dog fox"),
      (3L, "cat fox fox fox")), Seq("dog"))
    assert(got.map(_._1).toSeq == Seq(1L, 2L))
    // saturation: tf 3 scores less than 3x the tf 1 contribution
    val one = topk(Seq((1L, "dog fox fox fox"), (2L, "cat fox fox fox")), Seq("dog"))
    assert(got.head._2 < 3 * one.head._2)
  }

  test("rare terms outweigh common terms") {
    // 'rare' appears in 1 of 5 docs, 'common' in all 5; doc 1 has only
    // common, doc 2 only rare (same tf, same length).
    val docs = Seq(
      (1L, "common aaa bbb"),
      (2L, "rare common ccc"),
      (3L, "common ddd eee"),
      (4L, "common fff ggg"),
      (5L, "common hhh iii"))
    val got = topk(docs, Seq("rare", "common"))
    assert(got.head._1 == 2L)
  }

  test("shorter documents win at equal tf (length normalization)") {
    val got = topk(Seq(
      (1L, "dog cat cat cat cat cat cat cat"),
      (2L, "dog cat")), Seq("dog"))
    assert(got.map(_._1).toSeq == Seq(2L, 1L))
  }

  test("k bounds the result and ties break by doc_id") {
    val docs = (1L to 8L).map(i => (i, "dog cat"))
    val got = topk(docs, Seq("dog"), k = 3)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(got.map(_._2).distinct.size == 1) // identical docs, equal scores
  }

  test("documents without any query term are absent") {
    val got = topk(Seq((1L, "dog"), (2L, "cat")), Seq("dog"))
    assert(got.map(_._1).toSeq == Seq(1L))
  }
}
