package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
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
  * Pruning consults only the index (metadata-sized collect, the
  * [[graft.operators.Placement]] snapshot precedent) and hands Spark the
  * surviving file list; the residual predicate is re-applied to the
  * pruned scan, so results are EXACTLY the unpruned `read.where(pred)` —
  * files whose [min, max] merely overlaps contribute only their matching
  * rows, and false drops are impossible (a file is dropped only when its
  * whole range misses the interval). ZoneMapsSpec pins equality and the
  * actually-skipped file count; the oracle gate runs the same aggregate
  * against the logical table.
  */
object ZoneMaps {

  val IndexDirName = "_graft_zonemaps"

  /** Per-file stats for `cols` over the parquet directory at `path`:
    * `(file, n_rows, <c>_min, <c>_max ...)` — one row per data file. */
  def buildIndex(spark: SparkSession, path: String,
      cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    val aggs = count(lit(1)).as("n_rows") +:
      cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
        max(col(c)).as(s"${c}_max")))
    df.groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Build and persist the index beside the data (one small parquet). */
  def writeIndex(spark: SparkSession, path: String,
      cols: Seq[String]): Unit =
    buildIndex(spark, path, cols).coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$IndexDirName")

  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/$IndexDirName")

  /** Incremental refresh for an append-only table: stat ONLY the data
    * files not yet in the index and union them in. At 10^6 files the
    * full rebuild re-reads the whole table; the refresh reads the
    * appended delta plus the metadata-sized index. Files present in the
    * index but gone on disk (compacted away) are dropped from it.
    * Returns the number of newly indexed files. */
  def updateIndex(spark: SparkSession, path: String,
      cols: Seq[String]): Long = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // compare by scheme-less path: input_file_name() renders file:///p
    // while FileSystem listing renders file:/p — same file, two spellings
    def norm(s: String) = new org.apache.hadoop.fs.Path(s).toUri.getPath
    val onDisk = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toString)
    val onDiskNorm = onDisk.map(norm).toSet
    val have = readIndex(spark, path)
    val kept = have.collect()
      .filter(r => onDiskNorm(norm(r.getAs[String]("file"))))
    val keptNorm = kept.map(r => norm(r.getAs[String]("file"))).toSet
    val newFiles = onDisk.filterNot(f => keptNorm(norm(f))).toSeq.sorted
    val updated =
      if (newFiles.isEmpty) spark.createDataFrame(
        spark.sparkContext.parallelize(kept.toSeq, 1), have.schema)
      else {
        val aggs = count(lit(1)).as("n_rows") +:
          cols.flatMap(c => Seq(min(col(c)).as(s"${c}_min"),
            max(col(c)).as(s"${c}_max")))
        val fresh = spark.read.parquet(newFiles: _*)
          .groupBy(input_file_name().as("file"))
          .agg(aggs.head, aggs.tail: _*)
        spark.createDataFrame(
            spark.sparkContext.parallelize(kept.toSeq, 1), have.schema)
          .unionByName(fresh)
      }
    // write-then-swap: the index dir is tiny, a plain overwrite re-read
    // races only with concurrent readers of the INDEX (not the data)
    val rows = updated.collect()
    spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toSeq, 1), have.schema)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/$IndexDirName")
    newFiles.length.toLong
  }

  /** Files whose `[min, max]` intersects `[lo, hi]` (either bound
    * optional), plus the total file count. Metadata-sized: the index
    * holds one row per file. A file with only nulls in `c` has null
    * min/max and is dropped — null rows cannot satisfy a range
    * predicate. */
  def candidateFiles(spark: SparkSession, path: String, c: String,
      lo: Option[Any], hi: Option[Any]): (Seq[String], Long) = {
    val idx = readIndex(spark, path)
    val keep = Seq(
      lo.map(v => col(s"${c}_max") >= lit(v)),
      hi.map(v => col(s"${c}_min") <= lit(v))
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
    // all-null stats evaluate the range test to null — that file is
    // droppable (null rows can't satisfy a range predicate), so null -> false
    val rows = idx.select(col("file"),
      coalesce(keep, lit(false)).as("keep")).collect()
    (rows.filter(_.getBoolean(1)).map(_.getString(0)).toSeq, rows.length.toLong)
  }

  /** Scan of `path` restricted to files that can hold `c` in `[lo, hi]`,
    * with the residual predicate applied — row-for-row equal to the
    * unpruned `read.where(...)`. Schema is taken from the directory so a
    * fully-pruned scan still returns the right (empty) shape. */
  def prunedScan(spark: SparkSession, path: String, c: String,
      lo: Option[Any], hi: Option[Any]): DataFrame = {
    val schema = spark.read.parquet(path).schema
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
