package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Standing regression gate for the round-10 degenerate-corpus sweeps
  * (EmptyCorpusProbe): every bug class found there gets the exact
  * query-on-degenerate-input that used to crash. The full 144-query
  * sweeps stay in the probe; this spec pins the six fixed sites plus
  * the PQ family's named-precondition contract.
  */
class DegenerateCorpusSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val srcDir = "/root/testdata/sf0.001"

  /** Write a degenerate copy of every driver table and return its dir.
    * mode: "empty" | "one" (single row) | "nulls" (20 rows, every
    * non-key column null). */
  private def corpus(mode: String): String = {
    val dir = s"/tmp/graft_test_degenerate_$mode"
    val marker = new java.io.File(s"$dir/.done")
    if (!marker.exists()) {
      Tables.all.foreach { t =>
        val src = spark.read.parquet(s"$srcDir/$t.parquet")
        val out = mode match {
          case "empty" => src.limit(0)
          case "one" => src.limit(1)
          case "nulls" =>
            val key = src.columns.head
            src.limit(20).select(src.columns.toSeq.map { c =>
              if (c == key) col(c)
              else lit(null).cast(src.schema(c).dataType).as(c)
            }: _*)
        }
        out.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
      }
      marker.createNewFile()
    }
    dir
  }

  private def rows(name: String, dir: String): Long =
    SparkEntry.queries(name)(spark, dir).count()

  test("empty corpus: spectral returns a defined empty direction " +
      "(was: NPE from null Gram cells)") {
    assert(rows("q_spectral_direction", corpus("empty")) == 0L)
  }

  test("empty corpus: partitioned prune reads the schema-less layout " +
      "(was: UNABLE_TO_INFER_SCHEMA on a fileless partitionBy write)") {
    assert(rows("q_partitioned_prune", corpus("empty")) == 0L)
  }

  test("one-row corpus: drift defines shares over an empty era " +
      "(was: DIVIDE_BY_ZERO on the unpopulated side's total)") {
    assert(rows("q_corpus_drift", corpus("one")) >= 0L)
  }

  test("null-heavy corpus: media synthesis, span trim and compaction " +
      "sizes are total (was: NPE / NOT_NULL_ASSERT)") {
    val dir = corpus("nulls")
    assert(rows("multimodal_phash", dir) == 20L)
    assert(rows("q_trim_dup_spans", dir) == 20L)
    assert(rows("q_compaction_plan", dir) >= 0L)
    assert(rows("q_spectral_direction", dir) == 0L) // all-null embeddings
  }

  test("adversarial binary corpus: hostile media payloads (truncated / " +
      "wrong magic / overflow geometry / random bytes) become per-row " +
      "quarantine verdicts, never executor exceptions, and the accepted " +
      "side decodes clean (r11 family — the media twin of the r10 " +
      "adversarial-text sweep)") {
    import spark.implicits._
    import graft.pipeline.Multimodal
    def i32(v: Int): Array[Byte] =
      Array(v.toByte, (v >> 8).toByte, (v >> 16).toByte, (v >> 24).toByte)
    val rnd = new scala.util.Random(11)
    val intact = Multimodal.mediaTable(
      (0L until 30L).map(i => (i, s"doc number $i body", "s", "en"))
        .toDF("doc_id", "text", "source", "lang"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("kind"),
        r.getAs[Array[Byte]]("payload")))
    val hostile = intact.flatMap { case (id, kind, p) =>
      val junk = new Array[Byte](rnd.nextInt(64)); rnd.nextBytes(junk)
      val overflowed = p.clone()
      if (kind == "image" && p.length > 26) i32(0x20000000).copyToArray(overflowed, 18)
      if (kind == "audio" && p.length > 44) i32(0x7fffffff).copyToArray(overflowed, 40)
      if (kind == "video" && p.length > 8) i32(0x40000000).copyToArray(overflowed, 4)
      Seq(
        (id * 10, kind, p, "s", "en"),                                   // intact
        (id * 10 + 1, kind, java.util.Arrays.copyOf(p, p.length / 2), "s", "en"),
        (id * 10 + 2, kind, junk, "s", "en"),
        (id * 10 + 3, kind, overflowed, "s", "en"),
        (id * 10 + 4, kind, Array.emptyByteArray, "s", "en"))
    }.toSeq.toDF("doc_id", "kind", "payload", "source", "lang")
    val verdicts = Multimodal.quarantineSplit(spark, hostile).collect()
    assert(verdicts.length == 150)
    val byMode = verdicts.groupBy(v => v.doc_id % 10)
    assert(byMode(0L).forall(!_.quarantined), "intact rows must all admit")
    assert(byMode(1L).forall(_.quarantined), "half-truncated rows must all quarantine")
    assert(byMode(3L).forall(_.quarantined), "overflow-geometry rows must all quarantine")
    assert(byMode(4L).forall(v => v.quarantined && v.reason == "bad_magic"))
    // the accepted side (intact rows + any junk that happens to parse)
    // must survive the full downstream decode, exception-free
    val good = Multimodal.goodMedia(spark, hostile)
    assert(Multimodal.extractFeatures(spark, good).count() ==
      good.count())
    assert(Multimodal.perceptualHashes(spark, good).count() ==
      good.count())
  }

  test("PQ family keeps its NAMED precondition on an unprepared corpus") {
    val e = intercept[IllegalArgumentException] {
      rows("ann_pq_topk", corpus("empty"))
    }
    assert(e.getMessage.contains("non-empty prepared corpus"),
      s"precondition must stay named, got: ${e.getMessage}")
  }
}
