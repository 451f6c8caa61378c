package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Partitioned

/** Hive-style partitioned layout: pruning evidence + value equality. */
class PartitionedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/tmp/graft_test_partitioned"

  private lazy val written: Unit = {
    val df = (0L until 3000L)
      .map(i => (i, Seq("a", "b", "c")(((i * 7) % 3).toInt), i % 13))
      .toDF("id", "kind", "v")
    Partitioned.write(df, dir, Seq("kind"))
  }

  test("one directory per partition value") {
    written
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(dirs.toSeq == Seq("kind=a", "kind=b", "kind=c"))
  }

  test("partition-column filters prune at listing time") {
    written
    val q = Partitioned.read(spark, dir).where(col("kind") === "b")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    // execute, then read the scan's numFiles metric: only kind=b's files
    // were opened (inputFiles would show the PRE-pruning listing)
    q.collect()
    val total = new java.io.File(dir).listFiles.filter(_.isDirectory)
      .flatMap(_.listFiles).count(_.getName.startsWith("part-"))
    val bFiles = new java.io.File(s"$dir/kind=b").listFiles
      .count(_.getName.startsWith("part-"))
    val numFiles = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.metrics("numFiles").value
    }
    assert(bFiles < total)
    assert(numFiles.contains(bFiles.toLong), s"numFiles=$numFiles, want $bFiles of $total")
  }

  test("pruned read equals the filtered full read") {
    written
    val pruned = Partitioned.read(spark, dir).where(col("kind") === "b")
      .agg(count(lit(1)), sum("v")).collect()(0)
    val full = Partitioned.read(spark, dir)
      .collect().filter(_.getAs[String]("kind") == "b")
    assert(pruned.getLong(0) == full.length)
    assert(pruned.getLong(1) == full.map(_.getAs[Long]("v")).sum)
  }
}
