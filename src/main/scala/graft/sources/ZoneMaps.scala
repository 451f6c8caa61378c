package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps (min/max skipping index) for parquet directories —
  * the data-skipping layer that sits between partition pruning (whole
  * directories, [[Partitioned]]) and row-group statistics (inside one
  * file): a tiny per-FILE index consulted at PLANNING time, so a selective
  * range predicate never even opens non-overlapping files.
  *
  * Why this matters at 100 TB: a table clustered on its query column
  * (sorted write, Z-order layout, or natural ingest order for time-like
  * columns) yields near-disjoint per-file ranges, and a range query then
  * touches O(selectivity) files instead of listing-and-opening all of
  * them. Parquet footers carry the same statistics, but reading a footer
  * is still one open+seek per file — 10^6 opens on a 100 TB table — while
  * the zone-map index is ONE metadata-sized parquet read.
  *
  * Index build is a single parallel scan: per-partition partial min/max
  * collapse map-side (each scan partition is a slice of exactly one file,
  * so the exchange moves one row per file per column-slice). The index
  * lives under `<path>/_graft_zonemaps`; names starting with `_` are
  * invisible to Spark's file listing (the `_spark_metadata` convention),
  * so the data directory stays readable as plain parquet.
  *
  * Pruning consults the index plus ONE directory listing (the same
  * listing Spark's own planner performs) and hands Spark the surviving
  * file list; the residual predicate is re-applied to the pruned scan, so
  * results are EXACTLY the unpruned `read.where(pred)` — files whose
  * [min, max] merely overlaps contribute only their matching rows, and
  * false drops are impossible (a file is dropped only when its whole
  * range misses the interval). The listing makes a STALE index safe in
  * both directions: data files appended after the last refresh are not
  * in the index, so they join the scan unpruned (never silently
  * excluded); index rows whose file is gone (compacted away) are
  * ignored. ZoneMapsSpec pins equality, the skipped-file counts, and
  * both staleness directions; the oracle gate runs the same aggregate
  * against the logical table.
  */
object ZoneMaps {

  val IndexDirName = "_graft_zonemaps"

  /** Directory-schema memo for [[prunedScan]]: the schema of a parquet
    * directory is stable across appends (same writer), so re-reading a
    * footer per query is a pure planning tax — one footer read per path
    * per process instead. [[writeIndex]]/[[updateIndex]] invalidate the
    * entry, and a caller that rewrites the table out-of-band can call
    * [[invalidateSchemaCache]] directly. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()

  def invalidateSchemaCache(path: String): Unit = schemaCache.remove(path)

  /** Scheme-less path: `input_file_name()` renders `file:///p` while a
    * FileSystem listing renders `file:/p` — same file, two spellings. */
  private def norm(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  /** The directory's data files (one FS listing — what Spark's planner
    * itself does before every scan of `path`). */
  private def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString).toSeq
  }

  private def statAggs(cols: Seq[String]) =
    count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))

  /** Per-file stats for `cols` over the parquet directory at `path`:
    * `(file, n_rows, <c>_min, <c>_max ...)` — one row per data file. */
  def buildIndex(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    val aggs = statAggs(cols)
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build and persist the index beside the data (one small parquet). */
  def writeIndex(spark: SparkSession, path: String,
      cols: Seq[String]): Unit = {
    buildIndex(spark, path, cols).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$IndexDirName")
    invalidateSchemaCache(path)
  }

  def indexExists(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$IndexDirName")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/$IndexDirName")

  /** Incremental refresh for an append-only table: stat ONLY the data
    * files not yet in the index and union them in. At 10^6 files the
    * full rebuild re-reads the whole table; the refresh reads the
    * appended delta plus the metadata-sized index. Files present in the
    * index but gone on disk (compacted away) are dropped from it.
    * Returns the number of newly indexed files.
    *
    * Fully distributed in the index: the existing rows are carried
    * kept-set -> semi-join -> union -> write without ever collecting
    * them to the driver (the r8 spelling round-tripped the whole index
    * through `collect()`, a driver bottleneck at 10^7 files). Only the
    * DELTA file list (the appended files to stat) and the directory
    * listing touch the driver — the same listing Spark's planner makes.
    * The refreshed index is written to a `_tmp` sibling and swapped in
    * rename-first (live aside to `_old`, tmp to live, drop `_old`) — no
    * window where BOTH the old and new index are deleted: a crash
    * mid-swap leaves at worst a missing live dir, which every reader
    * treats as "all files unindexed" (unpruned scan, still correct). A
    * missing index (first call, or recovery from such a crash) degrades
    * to the full [[writeIndex]] build. */
  def updateIndex(spark: SparkSession, path: String,
      cols: Seq[String]): Long = {
    import spark.implicits._
    val onDisk = listDataFiles(spark, path)
    if (!indexExists(spark, path)) {
      writeIndex(spark, path, cols)
      return onDisk.length.toLong
    }
    val have = readIndex(spark, path)
    val normU = udf(norm _)
    val listing = onDisk.toDF("disk_file")
      .withColumn("fn", normU(col("disk_file")))
    // indexed rows whose file still exists (index stays distributed; the
    // listing side is metadata-sized, AQE picks the join strategy)
    val kept = have.withColumn("fn", normU(col("file")))
      .join(listing.select("fn"), Seq("fn"), "left_semi")
      .drop("fn")
    // appended files: on disk, absent from the index — delta-sized collect
    val newFiles = listing
      .join(have.select(normU(col("file")).as("fn")), Seq("fn"), "left_anti")
      .select("disk_file").as[String].collect().sorted.toSeq
    val updated =
      if (newFiles.isEmpty) kept
      else {
        val aggs = statAggs(cols)
        kept.unionByName(spark.read.parquet(newFiles: _*)
          .groupBy(input_file_name().as("file"))
          .agg(aggs.head, aggs.tail: _*))
      }
    val fsPath = new org.apache.hadoop.fs.Path(s"$path/$IndexDirName")
    val tmpPath = new org.apache.hadoop.fs.Path(s"$path/${IndexDirName}_tmp")
    val oldPath = new org.apache.hadoop.fs.Path(s"$path/${IndexDirName}_old")
    val fs = fsPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    updated.coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(tmpPath.toString)
    // rename-first swap: at every step either a live index or NO index
    // exists — never a half-written one — and a missing index is the sound
    // degraded state (all files scanned unindexed)
    fs.delete(oldPath, true) // debris from a previous crashed swap
    require(fs.rename(fsPath, oldPath),
      s"zone-map index swap failed: $fsPath -> $oldPath")
    require(fs.rename(tmpPath, fsPath),
      s"zone-map index swap failed: $tmpPath -> $fsPath")
    fs.delete(oldPath, true)
    invalidateSchemaCache(path)
    newFiles.length.toLong
  }

  /** Files that can hold `c` in `[lo, hi]` (either bound optional), plus
    * the on-disk data-file count. Metadata-sized: one index read + one
    * directory listing. Soundness under a stale index: data files NOT in
    * the index are always candidates (their rows are recovered by the
    * residual predicate), and index rows whose file is gone are ignored
    * — so [[prunedScan]] equals the unpruned filtered read even between
    * refreshes. A file with only nulls in `c` has null min/max and is
    * dropped — null rows cannot satisfy a range predicate. */
  def candidateFiles(spark: SparkSession, path: String, c: String,
      lo: Option[Any], hi: Option[Any]): (Seq[String], Long) = {
    import spark.implicits._
    val onDisk = listDataFiles(spark, path)
    // no index (never built, or mid-swap crash window): every file is a
    // candidate — degraded to the unpruned scan, never an error
    if (!indexExists(spark, path)) return (onDisk, onDisk.length.toLong)
    val keep = Seq(
      lo.map(v => col(s"${c}_max") >= lit(v)),
      hi.map(v => col(s"${c}_min") <= lit(v))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
    // all-null stats evaluate the range test to null — that file is
    // droppable (null rows can't satisfy a range predicate), so null -> false.
    // The range test runs DISTRIBUTED on the index relation in ONE job:
    // the listing left-outer-joins the filtered index, keeping files the
    // index clears (keep) plus files the index has never seen (no match
    // — appended after the last refresh, always candidates); dead index
    // rows never match the listing and drop out. Only the SURVIVING file
    // names reach the driver — O(selectivity), not one row per indexed
    // file. The driver already holds the directory listing (Spark's
    // planner makes the same one before every scan).
    val normU = udf(norm _)
    val listing = onDisk.toDF("disk_file")
      .withColumn("fn", normU(col("disk_file")))
    val idx = readIndex(spark, path)
      .select(normU(col("file")).as("fn"),
        coalesce(keep, lit(false)).as("keep"))
    val files = listing.join(idx, Seq("fn"), "left_outer")
      .where(col("keep").isNull || col("keep"))
      .select("disk_file").as[String].collect().toSeq
    (files, onDisk.length.toLong)
  }

  /** Scan of `path` restricted to files that can hold `c` in `[lo, hi]`,
    * with the residual predicate applied — row-for-row equal to the
    * unpruned `read.where(...)` even when the index is stale (see
    * [[candidateFiles]]). Schema is taken from the directory (memoized
    * per path — one footer read per process, not per query) so a
    * fully-pruned scan still returns the right (empty) shape. */
  def prunedScan(spark: SparkSession, path: String, c: String,
      lo: Option[Any], hi: Option[Any]): DataFrame = {
    val schema = schemaCache.computeIfAbsent(path,
      p => spark.read.parquet(p).schema)
    val (files, _) = candidateFiles(spark, path, c, lo, hi)
    val base =
      if (files.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else spark.read.schema(schema).parquet(files: _*)
    val residual = Seq(
      lo.map(v => col(c) >= lit(v)),
      hi.map(v => col(c) <= lit(v))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
    base.where(residual)
  }
}
