package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.pipeline.{Sampling, Similarity, TextAnalysis}

/** Specs for the round-3 pipeline additions: tf-idf, deterministic
  * sampling, int8 quantization. */
class PipelineOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("tf-idf ranks a document's distinctive term above corpus-wide terms") {
    val docs = Seq(
      (1L, "shared words here plus zebra zebra zebra"),
      (2L, "shared words here plus common filler"),
      (3L, "shared words here plus common filler")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(docs, k = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    // 'zebra': tf 3, df 1 — maximal score for doc 1
    assert(top(1L) == "zebra")
  }

  test("hash sampling is deterministic and roughly proportional") {
    val df = spark.range(0, 10000).toDF("doc_id")
    val a = Sampling.hashSample(df, col("doc_id"), 20).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, col("doc_id"), 20).collect().map(_.getLong(0)).toSet
    assert(a == b)
    assert(a.size > 1500 && a.size < 2500)
    // rate monotonicity: a 20% sample contains the 10% sample
    val c = Sampling.hashSample(df, col("doc_id"), 10).collect().map(_.getLong(0)).toSet
    assert(c.subsetOf(a))
  }

  test("budgeted mix respects per-language token budgets, quality first") {
    val good = "the cat and the dog sat in a house, that is to say the pair of them."
    val bad = "x y z w v u"  // no stopwords -> fails quality
    val docs = (1L to 40L).map { i =>
      (i, if (i % 4 == 0) bad else good, if (i <= 20) "en" else "de")
    }.toDF("doc_id", "text", "lang")
    val kept = Sampling.budgetedMix(docs, tokenBudget = 60L, nBuckets = 8)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // per language: kept token total within budget
    kept.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._3).sum <= 60L, s"$lang over budget")
      assert(rows.nonEmpty, s"$lang kept nothing")
    }
    // quality-passing docs fill the budget before any bad doc is taken
    val keptIds = kept.map(_._1).toSet
    assert(keptIds.forall(_ % 4 != 0), s"low-quality doc kept: $keptIds")
    // decision relation agrees with the kept set
    val buckets = Sampling.budgetedMixBuckets(docs, 60L, 8)
      .where(col("kept")).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_docs")).groupBy(_._1)
      .map { case (l, xs) => l -> xs.map(_._2).sum }
    assert(buckets("en") == kept.count(_._2 == "en"))
  }

  test("priority sampling favors heavy weights, is deterministic, bounds k") {
    import graft.pipeline.Sampling
    // 200 light rows (w=1) + 20 heavy rows (w=1000) in one group
    val rows = ((1L to 200L).map(i => (i, "g", 1L)) ++
      (201L to 220L).map(i => (i, "g", 1000L))).toDF("id", "grp", "w")
    val got = Sampling.prioritySample(rows, col("grp"), col("id"), col("w"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(got.size == 20)
    // heavy rows are 1000x likelier per slot: expect a clear majority
    assert(got.count(_ > 200L) >= 15, s"heavy picked ${got.count(_ > 200L)}")
    // deterministic across runs
    val again = Sampling.prioritySample(rows, col("grp"), col("id"), col("w"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(got == again)
    // non-positive weights never win
    val withZero = rows.unionByName(Seq((999L, "g", 0L)).toDF("id", "grp", "w"))
    val z = Sampling.prioritySample(withZero, col("grp"), col("id"), col("w"), 20)
      .collect().map(_.getLong(0)).toSet
    assert(!z.contains(999L))
  }

  test("stratified sampling applies per-stratum rates") {
    val df = spark.range(0, 3000)
      .select(col("id").as("doc_id"),
        when(col("id") % 2 === 0, "en").otherwise("de").as("lang"))
    val got = Sampling.stratifiedSample(df, col("lang"), col("doc_id"),
      Map("en" -> 100, "de" -> 0), defaultPct = 0).collect()
    assert(got.nonEmpty && got.forall(_.getString(1) == "en"))
  }

  test("int8 quantization stays in [-127, 127] and maps extremes to the rails") {
    val embs = Seq(
      (1L, Array(1.0f, -1.0f, 0.0f)),
      (2L, Array(0.5f, 0.25f, -0.125f))).toDF("vec_id", "embedding")
    val rows = Similarity.quantizeStats(embs).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("q_min"), r.getAs[Long]("q_max"))).toMap
    assert(rows(1L) == (-127L, 127L))
    assert(rows(2L)._1 >= -127L && rows(2L)._2 <= 127L)
  }

  test("approx_count_distinct sketch is within 5% of exact on events users") {
    val ev = spark.range(0, 20000)
      .selectExpr("id % 1500 AS user_id")
    val row = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.01).as("approx")).head()
    val (exact, approx) = (row.getLong(0), row.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx $approx vs exact $exact")
  }

  test("rolling chunks agree with an in-scala model") {
    import graft.pipeline.{Dedup, TextAnalysis}
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again and again"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (3L, "too short")).toDF("doc_id", "text")
    val got = TextAnalysis.rollingChunks(docs, w = 3, boundaryMod = 4).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // independent model
    val md = java.security.MessageDigest.getInstance("MD5")
    val P = Dedup.P
    val bPow = Array.iterate(1L, 3)(b => b * 1000003L % P)
    def model(text: String): (Long, Long, Long) = {
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toArray
      val hs = toks.map(t => Dedup.md5Top60(md, t) % P)
      val rs = (0 to hs.length - 3).map { i =>
        (0 until 3).map(j => hs(i + j) * bPow(j) % P).sum % P
      }
      (rs.size.toLong, rs.count(_ % 4 == 0).toLong, rs.sum % P)
    }
    assert(got(1L) == model(docs.collect()(0).getString(1)))
    assert(got(2L) == model("alpha beta gamma delta epsilon zeta eta theta iota kappa"))
    assert(!got.contains(3L)) // fewer than w tokens -> excluded
  }

  test("split3 partitions every row, deterministically, ~80/10/10; " +
      "salt re-rolls the assignment") {
    import org.apache.spark.sql.functions.col
    val df = (1L to 2000L).toDF("id")
    val a = Sampling.split3(df, col("id"), 80, 10).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(a.length == 2000, "every row gets a split")
    val bySplit = a.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 1400 && bySplit("train") < 1800)
    assert(bySplit("val") > 100 && bySplit("val") < 320)
    val b = Sampling.split3(df, col("id"), 80, 10).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(a.toMap == b.toMap, "re-runs reproduce the split")
    val c = Sampling.split3(df, col("id"), 80, 10, salt = "exp2").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a.count { case (k, v) => c(k) != v } > 100,
      "a new salt must re-roll a substantial fraction")
    intercept[IllegalArgumentException] {
      Sampling.split3(df, col("id"), 90, 10)
    }
  }

  test("hardNegatives drops positives, re-ranks densely, bounds k") {
    import org.apache.spark.sql.functions.col
    import graft.pipeline.Eval
    val cands = Seq(
      (1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L), (1L, 13L, 4L),
      (2L, 20L, 1L), (2L, 21L, 2L)).toDF("query_id", "neighbor_id", "rank")
    val pos = Seq((1L, 10L), (1L, 12L)).toDF("query_id", "neighbor_id")
    val got = Eval.hardNegatives(cands, pos, k = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neg_rank")) ->
        r.getAs[Long]("neighbor_id")).toMap
    // query 1: 10 and 12 are positives; survivors 11 (rank 2), 13 (rank 4)
    // re-rank densely to neg_rank 1, 2
    assert(got == Map((1L, 1L) -> 11L, (1L, 2L) -> 13L,
      (2L, 1L) -> 20L, (2L, 2L) -> 21L))
  }
}
