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
    * footer per query is a pure planning tax. The cache key carries the
    * directory's data-file fingerprint (count + newest mtime + total
    * bytes, from the SAME listing the prune itself needs — zero extra FS
    * calls), so an out-of-band rewrite with an evolved schema changes
    * the key and misses the cache instead of serving a stale schema.
    * Bounded: past [[SchemaCacheMax]] entries the map is cleared (it is
    * a memo, not a source of truth — a clear costs one footer re-read
    * per live path). [[invalidateSchemaCache]] remains for callers that
    * want an explicit drop. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, org.apache.spark.sql.types.StructType]()
  private val SchemaCacheMax = 256

  def invalidateSchemaCache(path: String): Unit = {
    val it = schemaCache.keySet.iterator()
    while (it.hasNext) { if (it.next().startsWith(path + "#")) it.remove() }
  }

  private def schemaFor(spark: SparkSession, path: String,
      listing: Seq[FileMeta]): org.apache.spark.sql.types.StructType = {
    val key = path + "#" + listing.length + "#" +
      (if (listing.isEmpty) 0L else listing.map(_.mtime).max) + "#" +
      listing.map(_.len).sum
    val hit = schemaCache.get(key)
    if (hit != null) hit
    else {
      val s = spark.read.parquet(path).schema
      if (schemaCache.size >= SchemaCacheMax) schemaCache.clear()
      schemaCache.put(key, s)
      s
    }
  }

  /** Scheme-less path: `input_file_name()` renders `file:///p` while a
    * FileSystem listing renders `file:/p` — same file, two spellings. */
  private def norm(s: String): String =
    new org.apache.hadoop.fs.Path(s).toUri.getPath

  final case class FileMeta(file: String, mtime: Long, len: Long)

  /** The directory's data files with their stats (one FS listing — what
    * Spark's planner itself does before every scan of `path`). */
  private def listDataFileMeta(spark: SparkSession, path: String): Seq[FileMeta] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(s => FileMeta(s.getPath.toString, s.getModificationTime, s.getLen))
      .toSeq
  }

  private def listDataFiles(spark: SparkSession, path: String): Seq[String] =
    listDataFileMeta(spark, path).map(_.file)

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

  /** Outcome of the planning-time prune. [[PrunedTo]] carries the
    * surviving file list (collected only when pruning actually pays —
    * O(selectivity) names); [[ScanAll]] means the caller should scan the
    * DIRECTORY and never sees a file name at all. */
  sealed trait PruneDecision { def totalFiles: Long }
  final case class PrunedTo(files: Seq[String], totalFiles: Long)
      extends PruneDecision
  final case class ScanAll(totalFiles: Long, reason: String)
      extends PruneDecision

  /** Minimum fraction of data files the index must drop before the
    * survivor list is collected and handed to the scan as explicit
    * paths. Below it, pruning saves little I/O while the survivor
    * round-trip costs a job result of up-to-file-count names — the
    * directory scan (Spark's own listing, zero names through a job
    * result) is the better plan, and it is always CORRECT because
    * pruning is an optimization: scanning more files changes nothing
    * once the residual predicate re-applies. */
  val PruneBenefitThreshold = 0.1

  private def keepExpr(c: String, lo: Option[Any], hi: Option[Any]) = Seq(
    lo.map(v => col(s"${c}_max") >= lit(v)),
    hi.map(v => col(s"${c}_min") <= lit(v))
  ).flatten.reduceOption(_ && _).getOrElse(lit(true))

  /** Decide the scan shape for `c in [lo, hi]` against the index.
    * Metadata-sized: one index read + one directory listing, and the
    * only file names that ever cross a job boundary are the SURVIVORS of
    * an effective prune — an ineffective prune (fewer than
    * [[PruneBenefitThreshold]] of files droppable) returns [[ScanAll]]
    * after a COUNT-only job, so no full-file-list collect exists on any
    * path (ZoneMapsSpec pins both shapes).
    *
    * Soundness under a stale index: data files NOT in the index are
    * always candidates (appended after the last refresh — the listing
    * left-outer-joins the index, and a no-match row survives), index
    * rows whose file is gone never match the listing and drop out, and a
    * missing index (never built / mid-swap crash window) degrades to
    * [[ScanAll]]. A file with only nulls in `c` has null min/max, the
    * range test evaluates null, and null -> false drops it — null rows
    * cannot satisfy a range predicate. */
  def pruneDecision(spark: SparkSession, path: String, c: String,
      lo: Option[Any], hi: Option[Any]): PruneDecision = {
    import spark.implicits._
    val onDisk = listDataFiles(spark, path)
    val total = onDisk.length.toLong
    if (!indexExists(spark, path)) return ScanAll(total, "no index")
    if (onDisk.isEmpty) return PrunedTo(Nil, 0L)
    val normU = udf(norm _)
    val listing = onDisk.toDF("disk_file")
      .withColumn("fn", normU(col("disk_file")))
    val idx = readIndex(spark, path)
      .select(normU(col("file")).as("fn"),
        coalesce(keepExpr(c, lo, hi), lit(false)).as("keep"))
    val joined = listing.join(idx, Seq("fn"), "left_outer")
      .where(col("keep").isNull || col("keep"))
    // job 1: COUNT the survivors (a 1-row result) to decide whether the
    // name collect is worth it; job 2 (conditional): the names. Both run
    // on the metadata-sized index relation.
    val survivors = joined.count()
    if (total - survivors < math.ceil(total * PruneBenefitThreshold).toLong)
      ScanAll(total, s"prune drops ${total - survivors}/$total files, " +
        s"below benefit threshold $PruneBenefitThreshold")
    else
      PrunedTo(joined.select("disk_file").as[String].collect().toSeq, total)
  }

  /** Files that can hold `c` in `[lo, hi]` (either bound optional), plus
    * the on-disk data-file count — the materialized-list view of
    * [[pruneDecision]] for callers that need explicit names ([[ScanAll]]
    * maps to the full listing the driver already holds; no extra job
    * result is paid for it). */
  def candidateFiles(spark: SparkSession, path: String, c: String,
      lo: Option[Any], hi: Option[Any]): (Seq[String], Long) =
    pruneDecision(spark, path, c, lo, hi) match {
      case PrunedTo(files, total) => (files, total)
      case ScanAll(total, _)      => (listDataFiles(spark, path), total)
    }

  /** Scan of `path` restricted to files that can hold `c` in `[lo, hi]`,
    * with the residual predicate applied — row-for-row equal to the
    * unpruned `read.where(...)` even when the index is stale (see
    * [[pruneDecision]]). An ineffective prune scans the DIRECTORY
    * (Spark's own listing — file names never round-trip through a job
    * result); an effective one passes only the surviving paths. Schema
    * comes from the directory, memoized under a staleness-aware key (one
    * footer read per live directory state, not per query), so a
    * fully-pruned scan still returns the right (empty) shape. */
  def prunedScan(spark: SparkSession, path: String, c: String,
      lo: Option[Any], hi: Option[Any]): DataFrame = {
    val schema = schemaFor(spark, path, listDataFileMeta(spark, path))
    val base = pruneDecision(spark, path, c, lo, hi) match {
      case PrunedTo(files, _) if files.isEmpty =>
        spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case PrunedTo(files, _) => spark.read.schema(schema).parquet(files: _*)
      case ScanAll(_, _)      => spark.read.schema(schema).parquet(path)
    }
    val residual = Seq(
      lo.map(v => col(c) >= lit(v)),
      hi.map(v => col(c) <= lit(v))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
    base.where(residual)
  }
}
