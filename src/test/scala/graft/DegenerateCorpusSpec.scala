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

  test("PQ family keeps its NAMED precondition on an unprepared corpus") {
    val e = intercept[IllegalArgumentException] {
      rows("ann_pq_topk", corpus("empty"))
    }
    assert(e.getMessage.contains("non-empty prepared corpus"),
      s"precondition must stay named, got: ${e.getMessage}")
  }
}
