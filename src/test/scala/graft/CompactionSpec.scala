package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Compaction

/** Compaction: NFD plan semantics + physical execution (file counts,
  * bin sizing, content equality). */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def planOf(items: (String, Long)*)(target: Long) =
    Compaction.plan(items.toDF("item", "bytes"), target)
      .collect().map(r => (r.getString(1), r.getLong(0))).toMap

  test("NFD packs size-descending, opens a bin on overflow") {
    val p = planOf("a" -> 60L, "b" -> 50L, "c" -> 40L, "d" -> 30L)(100L)
    // order: a60 b50 c40 d30 -> [a], [b,c], [d] with target 100
    assert(p == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
  }

  test("oversized item gets its own bin; ties break by name") {
    val p = planOf("big" -> 500L, "x" -> 10L, "y" -> 10L)(100L)
    assert(p("big") == 0L && p("x") == 1L && p("y") == 1L)
    // equal bytes: lexicographic item order decides packing deterministically
    val q = planOf("b" -> 60L, "a" -> 60L, "c" -> 60L)(120L)
    assert(q == Map("a" -> 0L, "b" -> 0L, "c" -> 1L))
  }

  test("compactDirectory merges small files into one file per bin") {
    val in = "/tmp/graft_test_compact_in"
    val out = "/tmp/graft_test_compact_out"
    // 16 tiny files
    val df = (0L until 4000L).map(i => (i, s"row$i")).toDF("id", "s")
    df.repartition(16).write.mode("overwrite").parquet(in)
    val nIn = new java.io.File(in).listFiles()
      .count(f => f.getName.endsWith(".parquet"))
    assert(nIn == 16)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    val planned = Compaction.compactDirectory(spark, in, out,
      targetBytes = 64 * 1024L)
    val nBins = planned.select("bin_id").distinct().count()
    assert(nBins < nIn, s"expected fewer bins than input files, got $nBins")
    // one parquet file per bin directory
    new java.io.File(out).listFiles().filter(_.isDirectory).foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1,
        s"bin dir ${d.getName} should hold exactly one file")
    }
    // content survives byte-for-byte (modulo the bin partition column)
    val got = spark.read.parquet(out).select("id", "s")
      .collect().map(_.toSeq).toSet
    assert(got == df.collect().map(_.toSeq).toSet)
    // every input file appears in the plan exactly once
    assert(planned.select("item").distinct().count() == nIn)
  }
}
