package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.{call_function, col, lit}
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Curation, Dedup}

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // ---------------------------------------------------------------
  // PII scan + redaction
  // ---------------------------------------------------------------

  test("piiScan counts and redacts each rule, leaves clean text alone") {
    val docs = Seq(
      (1L, "reach me at alice.b+spam@sub.example.org or bob@x.co thanks"),
      (2L, "call +1-415-555-0199 about ssn 123-45-6789 from 192.168.0.1"),
      (3L, "nothing sensitive here at all"),
      (4L, "")).toDF("doc_id", "text")
    val out = Curation.piiScan(docs).collect()
      .map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[Long]("n_email") == 2)
    assert(out(1L).getAs[Long]("n_pii") == 2)
    assert(out(1L).getAs[String]("redacted") ==
      "reach me at <EMAIL> or <EMAIL> thanks")

    assert(out(2L).getAs[Long]("n_phone") == 1)
    assert(out(2L).getAs[Long]("n_ssn") == 1)
    assert(out(2L).getAs[Long]("n_ip") == 1)
    assert(out(2L).getAs[String]("redacted") ==
      "call <PHONE> about ssn <SSN> from <IP>")

    assert(out(3L).getAs[Long]("n_pii") == 0)
    assert(out(3L).getAs[String]("redacted") == "nothing sensitive here at all")
    assert(out(4L).getAs[String]("redacted") == "")
  }

  test("phone and SSN shapes do not cross-match (3-3-4 vs 3-2-4)") {
    val docs = Seq((1L, "+1-415-555-0199"), (2L, "123-45-6789")).toDF("doc_id", "text")
    val out = Curation.piiScan(docs).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("n_phone") == 1 && out(1L).getAs[Long]("n_ssn") == 0)
    assert(out(2L).getAs[Long]("n_ssn") == 1 && out(2L).getAs[Long]("n_phone") == 0)
  }

  // ---------------------------------------------------------------
  // Quality rules
  // ---------------------------------------------------------------

  test("qualityRules flags each rule with sorted reasons; healthy doc keeps") {
    val docs = Seq(
      // healthy: enough tokens, normal word length, has stopwords
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      // too few tokens AND no stopwords
      (2L, "word"),
      // numeral-heavy (all digits) and no stopwords
      (3L, "1 2 3 4 5 6 7 8 9 10"),
      // mean word length absurdly long
      (4L, "the pneumonoultramicroscopicsilicovolcanoconiosis supercalifragilisticexpialidocious honorificabilitudinitatibus antidisestablishmentarianism floccinaucinihilipilification")
    ).toDF("doc_id", "text")
    val out = Curation.qualityRules(docs).collect().map(r => r.getLong(0) -> r).toMap

    assert(out(1L).getAs[Boolean]("keep"))
    assert(out(1L).getAs[String]("reasons") == "")
    assert(!out(2L).getAs[Boolean]("keep"))
    assert(out(2L).getAs[String]("reasons") == "no_stopwords,too_few_tokens")
    assert(!out(3L).getAs[Boolean]("keep"))
    assert(out(3L).getAs[String]("reasons").contains("numeral_heavy"))
    assert(!out(4L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[String]("reasons").contains("mean_word_long"))
  }

  // ---------------------------------------------------------------
  // Duplicate-block removal
  // ---------------------------------------------------------------

  test("dropDuplicateBlocks removes blocks shared by >maxDf docs, keeps the rest") {
    // a 10-token boilerplate block planted in docs 1..4 (> maxDf=2),
    // each doc also has 10 unique tokens
    val boiler = (1 to 10).map(i => s"boiler$i").mkString(" ")
    def uniq(d: Int) = (1 to 10).map(i => s"u${d}w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler ${uniq(1)}"),
      (2L, s"$boiler ${uniq(2)}"),
      (3L, s"$boiler ${uniq(3)}"),
      (4L, s"$boiler ${uniq(4)}"),
      (5L, uniq(5)),
      (6L, "")).toDF("doc_id", "text")
    val out = Curation.dropDuplicateBlocks(docs, w = 10, maxDf = 2).collect()
      .map(r => r.getLong(0) -> r).toMap

    (1L to 4L).foreach { d =>
      assert(out(d).getAs[Long]("n_blocks") == 2)
      assert(out(d).getAs[Long]("n_removed") == 1)
      assert(out(d).getAs[String]("clean_text") == uniq(d.toInt))
    }
    assert(out(5L).getAs[Long]("n_removed") == 0)
    assert(out(5L).getAs[String]("clean_text") == uniq(5))
    // empty doc: zero blocks, present in output
    assert(out(6L).getAs[Long]("n_blocks") == 0)
    assert(out(6L).getAs[String]("clean_text") == "")
  }

  test("a fully-boilerplate doc rebuilds to empty, order is preserved") {
    val blockA = (1 to 10).map(i => s"a$i").mkString(" ")
    val blockB = (1 to 10).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, blockA), (2L, blockA), (3L, blockA),
      // doc 4: unique, boiler, unique — middle block removed, order kept
      (4L, s"$blockB $blockA ${(1 to 10).map(i => s"c$i").mkString(" ")}"))
      .toDF("doc_id", "text")
    val out = Curation.dropDuplicateBlocks(docs, w = 10, maxDf = 2).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[String]("clean_text") == "")
    assert(out(4L).getAs[String]("clean_text") ==
      s"$blockB ${(1 to 10).map(i => s"c$i").mkString(" ")}")
  }

  // ---------------------------------------------------------------
  // Duplicated spans (sliding window)
  // ---------------------------------------------------------------

  test("duplicateSpans finds offset-shifted and within-doc duplicated spans") {
    val P = (1 to 12).map(i => s"p$i").mkString(" ") // 12-token copied passage
    val Q = (1 to 8).map(i => s"q$i").mkString(" ")  // 8-token repeated run
    val docs = Seq(
      // P at offset 0 in doc 1, offset 5 in doc 2 — an alignment
      // dropDuplicateBlocks' stride-w grid cannot see
      (1L, s"$P ${(1 to 10).map(i => s"a$i").mkString(" ")}"),
      (2L, s"${(1 to 5).map(i => s"b$i").mkString(" ")} $P " +
        (1 to 3).map(i => s"c$i").mkString(" ")),
      // within-doc repetition: Q at offsets 0 and 17, far enough apart
      // that the two spans must NOT merge
      (3L, s"$Q ${(1 to 9).map(i => s"d$i").mkString(" ")} $Q"),
      (4L, "too short"),                              // < w tokens: no windows
      (5L, (1 to 20).map(i => s"e$i").mkString(" "))) // unique: no spans
      .toDF("doc_id", "text")
    val out = Curation.duplicateSpans(docs, w = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2))
    assert(out.toSeq == Seq(
      (1L, 0L, 12L, 5L),  // 5 overlapping dup windows merged into P's extent
      (2L, 5L, 17L, 5L),
      (3L, 0L, 8L, 1L),
      (3L, 17L, 25L, 1L)))
  }

  test("duplicateSpans matches an independent model on a seeded random corpus") {
    // independent driver-side model: string windows (no hashing), brute
    // counts, fold-based island merge — shares no code with the operator
    def modelSpans(docs: Seq[(Long, String)], w: Int): Set[(Long, Long, Long, Long)] = {
      val tok = docs.map { case (id, t) =>
        id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector }
      val windows = for {
        (id, ts) <- tok; if ts.length >= w
        s <- 0 to ts.length - w
      } yield (id, s, ts.slice(s, s + w).mkString(" "))
      val counts = windows.groupBy(_._3).view.mapValues(_.size).toMap
      windows.filter(x => counts(x._3) > 1).groupBy(_._1).flatMap { case (id, ws) =>
        val islands = ws.map(_._2).sorted
          .foldLeft(Vector.empty[Vector[Int]]) { (acc, s) =>
            if (acc.nonEmpty && s <= acc.last.last + w) acc.init :+ (acc.last :+ s)
            else acc :+ Vector(s)
          }
        islands.map(is => (id, is.head.toLong, is.last.toLong + w, is.size.toLong))
      }.toSet
    }
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 25).map(i => s"t$i") // small vocab: natural collisions
    val base = (1L to 30L).map { id =>
      id -> Vector.fill(rnd.nextInt(41))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // planted copies: a slice of an earlier doc behind fresh-prefix noise
    val planted = (31L to 36L).map { id =>
      val (_, src) = base(rnd.nextInt(base.size))
      val ts = src.split(' ').filter(_.nonEmpty)
      val take = ts.drop(rnd.nextInt(math.max(ts.length, 1))).take(10)
      id -> (Seq.fill(3)(s"p${id}x${rnd.nextInt(9)}") ++ take).mkString(" ")
    }
    val all = base ++ planted
    val w = 4
    val got = Curation.duplicateSpans(all.toDF("doc_id", "text"), w = w)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val expected = modelSpans(all, w)
    assert(expected.nonEmpty, "seeded corpus must contain duplicated spans")
    assert(got == expected)
  }

  test("trimDuplicateSpans keeps the canonical occurrence, trims the rest") {
    val P = (1 to 12).map(i => s"p$i").mkString(" ")
    val Q = (1 to 8).map(i => s"q$i").mkString(" ")
    val docs = Seq(
      (1L, s"$P ${(1 to 10).map(i => s"a$i").mkString(" ")}"),
      (2L, s"${(1 to 5).map(i => s"b$i").mkString(" ")} $P " +
        (1 to 3).map(i => s"c$i").mkString(" ")),
      (3L, s"$Q ${(1 to 9).map(i => s"d$i").mkString(" ")} $Q"),
      (4L, "too short"),
      (5L, (1 to 20).map(i => s"e$i").mkString(" ")))
      .toDF("doc_id", "text")
    val out = Curation.trimDuplicateSpans(docs, w = 8).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)), r.getString(4))).toMap
    // doc 1 holds every canonical P window (min doc_id): untouched
    assert(out(1L)._1 === ((22L, 22L, 0L)))
    // doc 2's P copy (starts 5..9) is non-canonical: span [5, 17) trimmed
    assert(out(2L)._1 === ((20L, 8L, 12L)))
    assert(out(2L)._2 ===
      ((1 to 5).map(i => s"b$i") ++ (1 to 3).map(i => s"c$i")).mkString(" "))
    // doc 3 repeats Q within-doc: first occurrence canonical, second cut
    assert(out(3L)._1 === ((25L, 17L, 8L)))
    assert(out(3L)._2 ===
      ((1 to 8).map(i => s"q$i") ++ (1 to 9).map(i => s"d$i")).mkString(" "))
    // short and unique docs survive whole
    assert(out(4L)._1 === ((2L, 2L, 0L)))
    assert(out(5L)._1 === ((20L, 20L, 0L)))
  }

  test("trimDuplicateSpans matches an independent model on a seeded corpus") {
    // independent model: string windows, brute counts, canonical = global
    // first by (doc_id, start), fold-based islands, positional trim
    def modelTrim(docs: Seq[(Long, String)], w: Int)
        : Map[Long, (Long, Long, String)] = {
      val tok = docs.map { case (id, t) =>
        id -> "[a-z0-9]+".r.findAllIn(t.toLowerCase).toVector }.toMap
      val windows = for {
        (id, ts) <- tok.toSeq; if ts.length >= w
        s <- 0 to ts.length - w
      } yield (id, s, ts.slice(s, s + w).mkString(" "))
      val byWin = windows.groupBy(_._3)
      val marks = byWin.values.filter(_.size > 1).flatMap { occ =>
        occ.sortBy(o => (o._1, o._2)).drop(1) // all but the canonical
      }.toSeq
      val removed = marks.groupBy(_._1).view.mapValues { ms =>
        ms.map(_._2).sorted.flatMap(s => s until s + w).toSet
      }.toMap
      tok.map { case (id, ts) =>
        val dead = removed.getOrElse(id, Set.empty)
        val kept = ts.zipWithIndex.collect { case (t, i) if !dead(i) => t }
        id -> (ts.length.toLong, kept.length.toLong, kept.mkString(" "))
      }
    }
    val rnd = new scala.util.Random(7)
    val vocab = (1 to 25).map(i => s"t$i")
    val base = (1L to 40L).map { id =>
      id -> Vector.fill(rnd.nextInt(41))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // planted copies: a slice of an earlier doc behind fresh-prefix noise
    val planted = (41L to 48L).map { id =>
      val (_, src) = base(rnd.nextInt(base.size))
      val ts = src.split(' ').filter(_.nonEmpty)
      val take = ts.drop(rnd.nextInt(math.max(ts.length, 1))).take(10)
      id -> (Seq.fill(3)(s"p${id}x${rnd.nextInt(9)}") ++ take).mkString(" ")
    }
    val docs = base ++ planted
    val w = 4
    val got = Curation.trimDuplicateSpans(docs.toDF("doc_id", "text"), w = w)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(4))))
      .toMap
    val expected = modelTrim(docs, w)
    assert(expected.values.exists(v => v._1 != v._2),
      "seeded corpus must contain trimmed spans")
    assert(got === expected)
  }

  // ---------------------------------------------------------------
  // Sequence packing
  // ---------------------------------------------------------------

  test("packSequences matches the sequential cumulative model per bucket") {
    val docs = (0L until 40L).map { i =>
      // token counts 1..13 in a deterministic pattern
      (i, (0 until (1 + (i % 13)).toInt).map(j => s"t$j").mkString(" "))
    }.toDF("doc_id", "text")
    val budget = 16L
    val out = Curation.packSequences(docs, budget = budget, buckets = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))

    // independent driver-side model
    val byBucket = (0L until 40L).groupBy(_ % 4)
    val expected = byBucket.flatMap { case (b, ids) =>
      var cum = 0L
      ids.sorted.map { id =>
        val n = 1 + (id % 13)
        val start = cum
        cum += n
        (id, b, n, start / budget, start % budget)
      }
    }.toSet
    assert(out.toSet == expected)
    // a document that straddles a boundary belongs to the seq it starts in
    val straddler = out.find(r => r._5 + r._3 > budget)
    assert(straddler.isDefined, "fixture should contain a straddling doc")
  }

  // ---------------------------------------------------------------
  // Incremental dedup
  // ---------------------------------------------------------------

  test("incremental dedup: ledger dup, batch dup, admitted") {
    val ledger = Seq("known doc one", "known doc two").toDF("text")
      .select(graft.pipeline.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val batch = Seq(
      (10L, "known doc one"),        // in ledger
      (11L, "KNOWN   DOC one"),      // normalizes to the same -> ledger dup
      (12L, "fresh content a"),      // admitted
      (13L, "fresh content a"),      // dup of 12 within batch
      (14L, "fresh content b")).toDF("doc_id", "text")
    val out = Dedup.incremental(batch, ledger).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(out(10L) == "ledger_dup")
    assert(out(11L) == "ledger_dup")
    assert(out(12L) == "admitted")
    assert(out(13L) == "batch_dup")
    assert(out(14L) == "admitted")
  }

  test("incremental dedup admits everything against an empty ledger") {
    val ledger = spark.emptyDataset[String].toDF("text")
      .select(graft.pipeline.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val batch = Seq((1L, "a doc"), (2L, "b doc")).toDF("doc_id", "text")
    val out = Dedup.incremental(batch, ledger).collect()
    assert(out.forall(_.getString(2) == "admitted"))
  }

  test("incremental near-dup: best ledger match, exact/near/unique/short verdicts") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val ledger = Seq(
      (1L, words(20)),                    // L1
      (2L, words(20)),                    // L2: exact copy of L1 (tie case)
      (3L, "totally unrelated ledger doc content here")).toDF("doc_id", "text")
    val batch = Seq(
      (101L, words(20)),                  // exact copy -> jaccard 100, tie -> min id 1
      (102L, words(19) + " x"),           // 17/19 shared shingles -> jaccard 89
      (103L, (1 to 10).map(i => s"u$i").mkString(" ")), // unique -> admitted
      (104L, "hi there")).toDF("doc_id", "text")        // < 3 tokens: no shingles
    val out = Dedup.incrementalNearDup(batch, ledger).collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)), Option(r.get(3))))
      .toMap
    assert(out(101L) == (("near_dup", Some(1L), Some(100L))))
    assert(out(102L) == (("near_dup", Some(1L), Some(89L))))
    assert(out(103L) == (("admitted", None, None)))
    assert(out(104L) == (("admitted", None, None)))
  }

  test("incremental near-dup drops over-cap ledger buckets whole, counts them") {
    def words(n: Int) = (1 to n).map(i => s"w$i").mkString(" ")
    val ledger = Seq((1L, words(20)), (2L, words(20))).toDF("doc_id", "text")
    val batch = Seq((101L, words(20))).toDF("doc_id", "text")
    val acc = spark.sparkContext.longAccumulator("test.neardup.dropped")
    // every shared bucket holds both ledger copies -> size 2 > maxBucket 1:
    // recall for that boilerplate family is deliberately sacrificed
    val out = Dedup.incrementalNearDup(batch, ledger, maxBucket = 1,
        droppedBuckets = Some(acc)).collect()
    assert(out.map(r => r.getLong(0) -> r.getString(1)).toMap == Map(101L -> "admitted"))
    assert(acc.value > 0, "dropped buckets must be observable")
  }

  test("bloom-pruned incremental dedup is bit-identical to the join form") {
    // 400 batch docs, every third fingerprint also in a 300-row ledger,
    // plus intra-batch dups — exercises all three verdicts through the
    // pruned path
    val batch = spark.range(0, 400)
      .selectExpr("id AS doc_id", "concat('doc ', CAST(id % 250 AS STRING)) AS text")
    val ledger = spark.range(0, 300)
      .selectExpr("concat('doc ', CAST(id * 3 AS STRING)) AS text")
      .select(graft.pipeline.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), r.getString(2))
    val plain = Dedup.incremental(batch, ledger).collect().map(key).toSet
    val bloom = Dedup.incrementalBloom(batch, ledger).collect().map(key).toSet
    assert(bloom == plain)
    spark.catalog.clearCache()
  }

  test("bloom-pruned incremental dedup stays exact even when the filter saturates") {
    // 64-bit filter over 200 keys: nearly every probe is a false positive —
    // the verdict join must absorb them all without changing any verdict
    val batch = spark.range(0, 200)
      .selectExpr("id AS doc_id", "concat('s', CAST(id AS STRING)) AS text")
    val ledger = spark.range(100, 300)
      .selectExpr("concat('s', CAST(id AS STRING)) AS text")
      .select(graft.pipeline.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val plain = Dedup.incremental(batch, ledger).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    val bloom = Dedup.incrementalBloom(batch, ledger, numBits = 64, numHashes = 2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(bloom == plain)
    assert(plain.count(_._2 == "ledger_dup") == 100)
    spark.catalog.clearCache()
  }

  test("bloom prune actually removes disjoint ledger rows before the join") {
    val batch = spark.range(0, 100)
      .selectExpr("id AS doc_id", "concat('b', CAST(id AS STRING)) AS text")
    val ledgerTexts = spark.range(0, 5000)
      .selectExpr("concat('L', CAST(id AS STRING)) AS text") // fully disjoint
    val ledger = ledgerTexts
      .select(graft.pipeline.TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val blob = batch
      .select(Dedup.hash60(
        graft.pipeline.TextAnalysis.fingerprint(col("text"))).as("v"))
      .agg(call_function("graft_bloom_agg", col("v"), lit(1 << 16), lit(5)))
      .head().getAs[Array[Byte]](0)
    val survivors = ledger.where(call_function("graft_might_contain",
      lit(blob), Dedup.hash60(col("fingerprint")))).count()
    // 5000 disjoint keys vs a 64 Ki-bit / 100-key filter: fp ~ 1e-10 of
    // saturation; allow a broad margin, the point is orders of magnitude
    assert(survivors < 50L, s"$survivors of 5000 disjoint ledger rows survived")
  }

  // ---------------------------------------------------------------
  // Deterministic epoch shuffle
  // ---------------------------------------------------------------

  test("epochShuffle is a deterministic per-epoch permutation over shards") {
    val ids = spark.range(0, 2000).toDF("doc_id")
    val e1 = Curation.epochShuffle(ids, col("doc_id"), epoch = 1, nShards = 8)
    val rows = e1.collect()

    // permutation: every id exactly once
    assert(rows.length == 2000)
    assert(rows.map(_.getAs[Long]("id")).sorted.sameElements(0L until 2000L))

    // shards cover [0, n) and positions are dense 1..size within each shard
    val byShard = rows.groupBy(_.getAs[Long]("shard"))
    assert(byShard.keySet.forall(s => s >= 0 && s < 8))
    byShard.foreach { case (s, rs) =>
      val pos = rs.map(_.getAs[Long]("pos")).sorted
      assert(pos.sameElements(1L to rs.length.toLong), s"shard $s positions not dense")
    }
    // md5 spreads ~uniformly: no shard is off by more than 2x from fair share
    assert(byShard.values.map(_.length).max <= 500,
      s"worst shard ${byShard.values.map(_.length).max} of fair-share 250")

    // deterministic: identical on re-evaluation
    val again = Curation.epochShuffle(ids, col("doc_id"), epoch = 1, nShards = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet == again)

    // epoch avalanche: epoch 2 is a genuinely different permutation
    val e2 = Curation.epochShuffle(ids, col("doc_id"), epoch = 2, nShards = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val moved = rows.count(r => e2(r.getLong(0)) != ((r.getLong(1), r.getLong(2))))
    assert(moved > 1800, s"only $moved of 2000 ids moved between epochs")
  }

  // ---------------------------------------------------------------
  // Retention report
  // ---------------------------------------------------------------

  test("retentionReport: funnel counts + basis points, empty stage -> zeros") {
    val df = Seq(
      (1L, 10L, true, true),
      (2L, 20L, true, false),
      (3L, 30L, false, true),
      (4L, 40L, true, true)).toDF("doc_id", "n_tokens", "keep", "ok")
    val got = Curation.retentionReport(df, col("n_tokens"), Seq(
        "raw" -> lit(true),
        "keep" -> col("keep"),
        "both" -> (col("keep") && col("ok")),
        "none" -> lit(false)))
      .orderBy("stage_idx").collect()
      .map(r => (r.getAs[Long]("stage_idx"), r.getAs[String]("stage"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("total_tokens"),
        r.getAs[Long]("docs_bp"), r.getAs[Long]("tokens_bp"))).toSeq
    assert(got == Seq(
      (0L, "raw", 4L, 100L, 10000L, 10000L),
      (1L, "keep", 3L, 70L, 7500L, 7000L),
      (2L, "both", 2L, 50L, 5000L, 5000L),
      (3L, "none", 0L, 0L, 0L, 0L)))
  }

  test("retentionReport is one pass: a single aggregate, no join or union") {
    val df = Seq((1L, 10L, true)).toDF("doc_id", "n_tokens", "keep")
    val plan = Curation.retentionReport(df, col("n_tokens"), Seq(
        "raw" -> lit(true), "keep" -> col("keep")))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("Join") && !plan.contains("Union"), plan)
  }

  test("corpusChecksum is row-order and partitioning independent, " +
      "and detects single-byte payload drift") {
    val rows = Seq((1L, "a", "alpha text"), (2L, "a", "beta text"),
      (3L, "b", "gamma text"), (4L, "b", "delta text"))
    def sum(df: org.apache.spark.sql.DataFrame) =
      Curation.corpusChecksum(df, col("slice"), col("id"), col("text"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).sortBy(_._1).toSeq
    val base = sum(rows.toDF("id", "slice", "text"))
    val shuffled = sum(rows.reverse.toDF("id", "slice", "text").repartition(7))
    assert(base == shuffled, "checksum must not depend on order/partitioning")
    val drifted = sum(rows.updated(1, (2L, "a", "beta texT"))
      .toDF("id", "slice", "text"))
    assert(drifted.head != base.head, "payload drift must change slice a")
    assert(drifted(1) == base(1), "slice b untouched")
  }

  test("corpusChecksum: even-duplicated row cancels in xor but not count") {
    val once = Curation.corpusChecksum(
        Seq((1L, "a", "x")).toDF("id", "slice", "text"),
        col("slice"), col("id"), col("text")).head()
    val thrice = Curation.corpusChecksum(
        Seq((1L, "a", "x"), (1L, "a", "x"), (1L, "a", "x"))
          .toDF("id", "slice", "text"),
        col("slice"), col("id"), col("text")).head()
    // xor of an odd replication equals the single-row checksum — the
    // documented blind spot; n_rows is the alibi column
    assert(once.getAs[Long]("payload_checksum") ==
      thrice.getAs[Long]("payload_checksum"))
    assert(once.getAs[Long]("n_rows") == 1L &&
      thrice.getAs[Long]("n_rows") == 3L)
  }

  test("normalizeText: control strip, quote/dash/NBSP mapping, " +
      "whitespace collapse, clean text untouched") {
    val raw1 = "  \u201cHello\u201d \u2014 world\tok "
    val df = Seq(
      (1L, raw1),
      (2L, "a b\u00a0 \u2018c\u2019"),
      (3L, "already clean")).toDF("doc_id", "text")
    val got = Curation.normalizeText(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("norm_text"), r.getAs[Long]("n_chars_raw"),
         r.getAs[Long]("n_chars_norm"))).toMap
    assert(got(1L)._1 == "\"Hello\" - world ok")
    assert(got(2L)._1 == "a b 'c'")
    assert(got(3L) == ("already clean", 13L, 13L))
    assert(got(1L)._2 == raw1.length.toLong)
  }

  test("normalizeText plans no exchange: pure narrow projection") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    val plan = Curation.normalizeText(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("lengthBuckets: bounds, waste arithmetic, over-cap top bucket") {
    val df = Seq(10L, 16L, 17L, 100L, 9999L).toDF("n")
    val got = Curation.lengthBuckets(df, col("n"), 16L, 128L)
      .orderBy("bucket_hi").collect()
      .map(r => (r.getAs[Long]("bucket_hi"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("sum_tokens"), r.getAs[Long]("padded_tokens"),
        r.getAs[Long]("waste_micros"))).toSeq
    assert(got == Seq(
      // 10,16 -> bucket 16: padded 32, real 26, waste 6/32
      (16L, 2L, 26L, 32L, 6L * 1000000 / 32L),
      // 17 -> bucket 32: waste 15/32
      (32L, 1L, 17L, 32L, 15L * 1000000 / 32L),
      // 100 and over-cap 9999 both land in bucket 128: padded 256,
      // capped base 100 + 128 = 228, waste 28/256
      (128L, 2L, 10099L, 256L, 28L * 1000000 / 256L)))
  }
}
