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

  test("dynamic partition pruning: a dim-side filter prunes the fact scan " +
      "at runtime") {
    written
    // the pruning value is only knowable AFTER the dim filter runs — the
    // static-pruning tests above can't cover this; at 100 TB it's what
    // keeps a star-join from scanning every date partition
    // Range-backed dim: a Seq-based local relation would have its filter
    // constant-folded away (ConvertToLocalRelation), and the pruning rule
    // requires a LIVE selective predicate on the filtering side
    val dim = spark.range(0, 3).selectExpr(
      "CASE id WHEN 0 THEN 'a' WHEN 1 THEN 'b' ELSE 'c' END AS kind",
      "CASE WHEN id = 0 THEN 'keep' ELSE 'drop' END AS grp")
    // the benefit heuristic sizes the fixture's 3-file scan below the DPP
    // overhead; force the fallback ratio so the RULE's behavior (not the
    // cost model's verdict on a toy table) is what's under test
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
      val q = Partitioned.read(spark, dir)
        .join(broadcast(dim).where(col("grp") === "keep"), "kind")
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("dynamicpruning"),
        s"fact scan must carry a runtime partition filter:\n$plan")
      assert(q.collect().length == 1000) // (i*7)%3==0 for a third of ids
      val aFiles = new java.io.File(s"$dir/kind=a").listFiles
        .count(_.getName.startsWith("part-"))
      // the join plans under AQE: query stages are leaf wrappers, so the
      // scan needs a recursive descent through stage boundaries
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.FileSourceScanExec
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
        case f: FileSourceScanExec => Seq(f)
        case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
        case s: QueryStageExec => scans(s.plan)
        case o => o.children.flatMap(scans)
      }
      val numFiles = scans(q.queryExecution.executedPlan)
        .headOption.map(_.metrics("numFiles").value)
      assert(numFiles.contains(aFiles.toLong),
        s"runtime-pruned scan must open only kind=a's files: $numFiles")
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.useStats", "true")
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
