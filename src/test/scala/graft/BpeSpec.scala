package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.functions._

import graft.pipeline.Bpe

/** Gates for distributed BPE merge training: value agreement with an
  * independent driver-side trainer (own greedy-fold implementation),
  * the classic overlapping-run edge cases, early stop, replayed
  * segmentation equality, and the encode join.
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  /** Independent driver-side reference: greedy left-to-right merge. */
  private def refMerge(seq: List[String], l: String, r: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    var carry: String = null
    seq.foreach { s =>
      if (carry == l && s == r) { out += (l + r); carry = null }
      else { if (carry != null) out += carry; carry = s }
    }
    if (carry != null) out += carry
    out.toList
  }

  private def refTrain(freq: Map[String, Long], k: Int)
      : (Seq[(Int, String, String, Long)], Map[String, List[String]]) = {
    var vocab = freq.keys.map(w => w -> w.map(_.toString).toList).toMap
    val merges = Seq.newBuilder[(Int, String, String, Long)]
    var rank = 1
    var done = false
    while (rank <= k && !done) {
      val pc = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (w, seq) =>
        seq.zip(seq.drop(1)).foreach { p =>
          pc(p) = pc.getOrElse(p, 0L) + freq(w) }
      }
      if (pc.isEmpty) done = true
      else {
        val ((l, r), cnt) = pc.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
        merges += ((rank, l, r, cnt))
        vocab = vocab.map { case (w, seq) => w -> refMerge(seq, l, r) }
        rank += 1
      }
    }
    (merges.result(), vocab)
  }

  private def wordsDf(freq: Map[String, Long]) =
    freq.toSeq.toDF("word", "freq")

  test("merges match the independent trainer, incl. overlapping runs") {
    // 'aaaa' exercises run parity (greedy merges land at even offsets),
    // 'banana' exercises a merged symbol re-merging at a later rank
    val freq = Map("aaaa" -> 10L, "aaa" -> 7L, "banana" -> 5L,
      "bandana" -> 4L, "abab" -> 3L, "x" -> 100L)
    val (refM, refV) = refTrain(freq, 6)
    val model = Bpe.train(wordsDf(freq), 6)
    assert(model.merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      === refM)
    val got = model.segmented.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(got === refV)
  }

  test("run parity: aaaa + (a,a) segments to [aa, aa], aaa to [aa, a]") {
    val freq = Map("aaaa" -> 2L, "aaa" -> 1L)
    val model = Bpe.train(wordsDf(freq), 1)
    assert(model.merges.map(m => (m.left, m.right)) === Seq(("a", "a")))
    val got = model.segmented.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(got === Map("aaaa" -> List("aa", "aa"), "aaa" -> List("aa", "a")))
  }

  test("stops early when no adjacent pair remains") {
    val model = Bpe.train(wordsDf(Map("a" -> 5L, "b" -> 3L)), 4)
    assert(model.merges.isEmpty)
    // and a 2-char vocab exhausts after one merge
    val m2 = Bpe.train(wordsDf(Map("ab" -> 5L)), 4)
    assert(m2.merges.map(m => (m.rank, m.merged)) === Seq((1, "ab")))
  }

  test("tie-break is (count desc, left asc, right asc)") {
    // 'zz' and 'ab' both count 5 -> 'ab' wins on left asc
    val model = Bpe.train(wordsDf(Map("zz" -> 5L, "ab" -> 5L)), 1)
    assert(model.merges.head.merged === "ab")
  }

  test("segment() replays a trained merge list identically") {
    val freq = Map("banana" -> 5L, "bandana" -> 4L, "cabana" -> 3L,
      "anagram" -> 2L)
    val model = Bpe.train(wordsDf(freq), 5)
    val replayed = Bpe.segment(wordsDf(freq), model.merges,
        checkpointEvery = 2)
      .collect().map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    val trained = model.segmented.collect()
      .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
    assert(replayed === trained)
  }

  test("sf0.001 corpus: merges + encode totals match the reference") {
    val docs = Tables.documents(spark, sfDir)
    val words = Bpe.wordFreq(docs, col("text"))
    val freq = words.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val (refM, refV) = refTrain(freq, 6)
    val model = Bpe.train(words, 6)
    assert(model.merges.map(m => (m.rank, m.left, m.right, m.pairCount))
      === refM)
    // encode: per-doc token totals equal the reference segmentation sums
    val enc = Bpe.encodedTokens(docs, col("text"), Seq(col("doc_id")),
      model.segmented)
    val gotTotal = enc.agg(sum("n_tokens")).collect()(0).getLong(0)
    val refTotal = freq.map { case (w, f) => f * refV(w).size }.sum
    assert(gotTotal === refTotal)
  }

  test("property: trainer equals the reference on 25 random corpora " +
      "(vocab, frequencies and merge depth all fuzzed)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import org.scalacheck.rng.Seed
    // tiny alphabet forces pair collisions, ties and run-parity cases
    val genWord = for {
      n <- Gen.choose(1, 7)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c"))
    } yield cs.mkString
    val genCorpus = for {
      nw <- Gen.choose(2, 8)
      ws <- Gen.listOfN(nw, genWord)
      fs <- Gen.listOfN(nw, Gen.choose(1L, 9L))
    } yield ws.zip(fs).toMap // map dedups colliding words (last freq wins)
    val prop = Prop.forAllNoShrink(genCorpus, Gen.choose(1, 4)) { (freq, k) =>
      val (refM, refV) = refTrain(freq, k)
      val model = Bpe.train(wordsDf(freq), k)
      val got = model.segmented.collect()
        .map(r => r.getString(0) -> r.getSeq[String](2).toList).toMap
      model.merges.map(m => (m.rank, m.left, m.right, m.pairCount)) == refM &&
        got == refV
    }
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(25)
      .withInitialSeed(Seed(0xB9E))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"bpe-fuzz: ${res.status}")
  }

  test("per-iteration plan: pair counts partial-aggregate before exchange") {
    val words = Bpe.wordFreq(Tables.documents(spark, sfDir),
      col("text"))
    val pairs = words
      .select(col("word"), col("freq").cast("long").as("freq"),
        regexp_extract_all(col("word"), lit("."), lit(0)).as("syms"))
      .select(col("freq"),
        explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("freq").as("cnt"))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("partial_sum") || plan.contains("HashAggregate"),
      s"expected map-side partial aggregation in:\n$plan")
  }
}
