package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.ZoneMaps

/** File-level zone maps: index exactness, skipping evidence, pruned-scan
  * equality (incl. boundary overlap and the fully-pruned empty case). */
class ZoneMapsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/tmp/graft_test_zonemaps"

  // 4 range-clustered files over v in [0, 4000) with disjoint v ranges
  // (boundaries are sampled by RangePartitioner — near, not exactly, 1000k)
  private lazy val written: Unit = {
    val df = (0L until 4000L).map(i => (i, i % 4000, s"r$i")).toDF("id", "v", "s")
    df.repartitionByRange(4, col("v")).sortWithinPartitions("v")
      .write.mode("overwrite").parquet(dir)
    ZoneMaps.writeIndex(spark, dir, Seq("v"))
  }

  test("index holds one exact min/max row per data file") {
    written
    val idx = ZoneMaps.readIndex(spark, dir).collect()
    val nFiles = new java.io.File(dir).listFiles()
      .count(f => f.getName.endsWith(".parquet") && !f.getName.startsWith("_"))
    assert(idx.length == nFiles)
    assert(idx.map(_.getAs[Long]("n_rows")).sum == 4000L)
    // per-file stats agree with reading that file alone
    idx.foreach { r =>
      val one = spark.read.parquet(r.getAs[String]("file"))
        .agg(min("v"), max("v")).head()
      assert(r.getAs[Long]("v_min") == one.getLong(0))
      assert(r.getAs[Long]("v_max") == one.getLong(1))
    }
  }

  test("range predicate skips non-overlapping files") {
    written
    // the top-range file alone survives a predicate above every other
    // file's max (ranges come from the ACTUAL index — RangePartitioner
    // samples, so boundaries are not exact 1000-multiples)
    val idx = ZoneMaps.readIndex(spark, dir)
      .collect().map(r => (r.getAs[String]("file"),
        r.getAs[Long]("v_min"), r.getAs[Long]("v_max")))
      .sortBy(_._2)
    assert(idx.length == 4)
    val (files, total) = ZoneMaps.candidateFiles(spark, dir, "v",
      Some(idx.map(_._3).sorted.apply(2) + 1L), None)
    assert(total == 4)
    assert(files.length == 1, s"expected the single top-range file: $files")
    // boundary overlap: an interval spanning the seam between the two
    // lowest files keeps exactly both
    val seam = Seq(idx(0)._3, idx(1)._2)
    val (two, _) = ZoneMaps.candidateFiles(spark, dir, "v",
      Some(seam.min), Some(seam.max))
    assert(two.length == 2, s"seam $seam kept $two")
  }

  test("pruned scan equals the unpruned filtered read") {
    written
    val full = spark.read.parquet(dir).where(col("v") >= 2500L && col("v") <= 3200L)
      .collect().map(_.toSeq).toSet
    val pruned = ZoneMaps.prunedScan(spark, dir, "v", Some(2500L), Some(3200L))
      .collect().map(_.toSeq).toSet
    assert(pruned == full && full.nonEmpty)
  }

  test("fully-pruned scan returns the empty frame with the data schema") {
    written
    val out = ZoneMaps.prunedScan(spark, dir, "v", Some(100000L), None)
    assert(out.columns.toSeq == Seq("id", "v", "s"))
    assert(out.count() == 0L)
  }

  test("incremental refresh stats only appended files and drops compacted ones") {
    val d3 = "/tmp/graft_test_zonemaps_incr"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d3))
    (0L until 1000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("v")).sortWithinPartitions("v")
      .write.mode("overwrite").parquet(d3)
    ZoneMaps.writeIndex(spark, d3, Seq("v"))
    // append two more files without touching the first two
    (1000L until 2000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("v")).sortWithinPartitions("v")
      .write.mode("append").parquet(d3)
    val statted = ZoneMaps.updateIndex(spark, d3, Seq("v"))
    assert(statted == 2L, s"expected 2 fresh files, statted $statted")
    // refreshed index == full rebuild
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    assert(canon(ZoneMaps.readIndex(spark, d3)) ==
      canon(ZoneMaps.buildIndex(spark, d3, Seq("v"))))
    // pruning works across old + new ranges
    val (files, total) = ZoneMaps.candidateFiles(spark, d3, "v",
      Some(1990L), None)
    assert(total == 4 && files.length == 1)
    // delete one data file (compaction): refresh drops its index row
    val victim = ZoneMaps.readIndex(spark, d3).collect()
      .map(_.getAs[String]("file")).sorted.head
    new java.io.File(new java.net.URI(victim)).delete()
    assert(ZoneMaps.updateIndex(spark, d3, Seq("v")) == 0L)
    assert(ZoneMaps.readIndex(spark, d3).count() == 3L)
  }

  test("stale index: files appended after the last refresh still scan " +
      "(unpruned candidates), so prunedScan never silently drops rows") {
    val d4 = "/tmp/graft_test_zonemaps_stale"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d4))
    (0L until 1000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("v")).sortWithinPartitions("v")
      .write.mode("overwrite").parquet(d4)
    ZoneMaps.writeIndex(spark, d4, Seq("v"))
    // append WITHOUT refreshing the index
    (1000L until 2000L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(d4)
    val full = spark.read.parquet(d4).where(col("v") >= 1500L)
      .collect().map(_.toSeq).toSet
    val pruned = ZoneMaps.prunedScan(spark, d4, "v", Some(1500L), None)
      .collect().map(_.toSeq).toSet
    assert(pruned == full && full.size == 500)
    // indexed files still prune: a low-range query drops the top indexed
    // file but must keep the unindexed appendix
    val (files, total) = ZoneMaps.candidateFiles(spark, d4, "v", None, Some(10L))
    assert(total == 3L)
    assert(files.length == 2, s"1 indexed survivor + 1 unindexed: $files")
  }

  test("stale index: rows for deleted files are ignored (no dead paths " +
      "handed to the scan)") {
    val d5 = "/tmp/graft_test_zonemaps_dead"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d5))
    (0L until 1000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("v")).sortWithinPartitions("v")
      .write.mode("overwrite").parquet(d5)
    ZoneMaps.writeIndex(spark, d5, Seq("v"))
    val victim = ZoneMaps.readIndex(spark, d5).collect()
      .map(_.getAs[String]("file")).sorted.head
    new java.io.File(new java.net.URI(victim)).delete()
    val (files, total) = ZoneMaps.candidateFiles(spark, d5, "v", None, None)
    assert(total == 1L && files.length == 1)
    assert(ZoneMaps.prunedScan(spark, d5, "v", None, None).count() > 0L)
  }

  test("hilbert layout prunes BOTH dimensions where a single-column sort " +
      "prunes one (the composed-tier claim, measured)") {
    import graft.operators.Hilbert
    // 2-D uniform grid: x, y in [0, 256)
    val df = (0L until 65536L).map(i => (i % 256, i / 256)).toDF("x", "y")
    val hPath = "/tmp/graft_test_zm_hilbert"
    val sPath = "/tmp/graft_test_zm_sorted"
    Hilbert.clusterBy2(df, "x", "y", partitions = 16, bits = 8)
      .write.mode("overwrite").parquet(hPath)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(sPath)
    ZoneMaps.writeIndex(spark, hPath, Seq("x", "y"))
    ZoneMaps.writeIndex(spark, sPath, Seq("x", "y"))
    def kept(path: String, c: String): Long =
      ZoneMaps.candidateFiles(spark, path, c, Some(0L), Some(31L))._1.length.toLong
    // x-sorted layout: perfect x pruning, NO y pruning
    assert(kept(sPath, "x") <= 3L)
    assert(kept(sPath, "y") == 16L)
    // hilbert layout: real pruning on BOTH dimensions
    assert(kept(hPath, "x") < 16L, s"x kept ${kept(hPath, "x")}")
    assert(kept(hPath, "y") < 16L, s"y kept ${kept(hPath, "y")}")
    // and results stay exact through the stacked prune
    val box = ZoneMaps.prunedScan(spark, hPath, "x", Some(0L), Some(31L))
      .where(col("y") >= 0L && col("y") <= 31L).count()
    assert(box == 32L * 32L)
  }

  test("candidateFiles runs the range test distributed: every driver " +
      "collect goes through the filter + existence join, never a bare " +
      "index scan") {
    written
    val plans = scala.collection.mutable.Buffer[String]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.executedPlan.toString }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val (files, total) = ZoneMaps.candidateFiles(spark, dir, "v",
        Some(3990L), None)
      assert(total == 4 && files.length == 1)
      // listener delivery is async
      var waited = 0
      def mine = plans.synchronized {
        plans.filter(_.contains(ZoneMaps.IndexDirName)).toList }
      while (mine.isEmpty && waited < 10000) {
        Thread.sleep(200); waited += 200
      }
      val indexPlans = mine
      assert(indexPlans.nonEmpty, "expected the single candidate collect " +
        "over the index")
      // the one collect must join the index against the listing (range
      // filter + existence in a single job) — a reintroduced full-index
      // collect (bare index scan straight to the driver, the r9-flagged
      // shape) has no join at all
      assert(indexPlans.forall(_.contains("Join")),
        s"an index collect bypassed the join:\n${indexPlans.mkString("\n---\n")}")
    } finally spark.listenerManager.unregister(listener)
  }

  test("missing index degrades to the unpruned scan and updateIndex " +
      "rebuilds from scratch (crash-window recovery)") {
    val d6 = "/tmp/graft_test_zonemaps_missing"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d6))
    (0L until 1000L).map(i => (i, i)).toDF("id", "v")
      .repartitionByRange(2, col("v")).sortWithinPartitions("v")
      .write.mode("overwrite").parquet(d6)
    // no index ever built: all files are candidates, results exact
    val (files0, total0) = ZoneMaps.candidateFiles(spark, d6, "v",
      Some(990L), None)
    assert(total0 == 2 && files0.length == 2)
    assert(ZoneMaps.prunedScan(spark, d6, "v", Some(990L), None)
      .count() == 10L)
    // updateIndex on a missing index = full build, not an error
    assert(ZoneMaps.updateIndex(spark, d6, Seq("v")) == 2L)
    assert(ZoneMaps.candidateFiles(spark, d6, "v", Some(990L), None)
      ._1.length == 1)
    // simulate a crash inside the swap window: live dir gone, only the
    // _old debris left — readers degrade, the next refresh recovers
    val live = new java.io.File(d6, ZoneMaps.IndexDirName)
    val old = new java.io.File(d6, ZoneMaps.IndexDirName + "_old")
    assert(live.renameTo(old))
    val (filesC, totalC) = ZoneMaps.candidateFiles(spark, d6, "v",
      Some(990L), None)
    assert(totalC == 2 && filesC.length == 2, "crash window must degrade, not error")
    assert(ZoneMaps.prunedScan(spark, d6, "v", Some(990L), None)
      .count() == 10L)
    assert(ZoneMaps.updateIndex(spark, d6, Seq("v")) == 2L)
    assert(ZoneMaps.candidateFiles(spark, d6, "v", Some(990L), None)
      ._1.length == 1)
  }

  test("ineffective prune returns ScanAll (directory scan, no file-name " +
      "collect) and stays row-equal; effective prune returns PrunedTo " +
      "with only the survivors") {
    written
    // bound-less predicate: every file survives -> below the benefit
    // threshold -> ScanAll, and NO name collect job runs for it
    ZoneMaps.pruneDecision(spark, dir, "v", None, None) match {
      case ZoneMaps.ScanAll(total, _) => assert(total == 4L)
      case other => fail(s"expected ScanAll for an ineffective prune: $other")
    }
    // the ScanAll-backed scan is still row-equal to the plain read
    val full = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    val scanned = ZoneMaps.prunedScan(spark, dir, "v", None, None)
      .collect().map(_.toSeq).toSet
    assert(scanned == full && full.size == 4000)
    // a selective predicate drops >= threshold -> PrunedTo with O(sel) names
    ZoneMaps.pruneDecision(spark, dir, "v", Some(3990L), None) match {
      case ZoneMaps.PrunedTo(files, total) =>
        assert(total == 4L && files.length == 1, s"survivors: $files")
      case other => fail(s"expected PrunedTo for an effective prune: $other")
    }
  }

  test("schema memo keys on the directory fingerprint: an out-of-band " +
      "rewrite with an evolved schema is seen, not served stale") {
    val d7 = "/tmp/graft_test_zonemaps_evolve"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d7))
    (0L until 100L).map(i => (i, i)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(d7)
    ZoneMaps.writeIndex(spark, d7, Seq("v"))
    assert(ZoneMaps.prunedScan(spark, d7, "v", None, Some(10L))
      .columns.toSeq == Seq("id", "v"))
    // out-of-band rewrite (no writeIndex/updateIndex/invalidate call):
    // same column count is not enough — an added column must show up
    (0L until 100L).map(i => (i, i, s"x$i")).toDF("id", "v", "extra")
      .coalesce(1).write.mode("overwrite").parquet(d7)
    val out = ZoneMaps.prunedScan(spark, d7, "v", None, Some(10L))
    assert(out.columns.toSeq == Seq("id", "v", "extra"),
      s"stale cached schema served: ${out.columns.toSeq}")
    assert(out.count() == 11L)
  }

  test("all-null stats drop the file; bound-less scan keeps everything") {
    val d2 = "/tmp/graft_test_zonemaps_null"
    (1L to 10L).map(i => (i, None: Option[Long])).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(d2)
    ZoneMaps.writeIndex(spark, d2, Seq("v"))
    val (files, total) = ZoneMaps.candidateFiles(spark, d2, "v", Some(1L), None)
    assert(total == 1 && files.isEmpty)
    val (all, _) = ZoneMaps.candidateFiles(spark, d2, "v", None, None)
    assert(all.length == 1)
  }
}
