package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Small-file compaction: plan and execute the re-binning of a
  * many-small-files parquet directory into target-sized files — the
  * table-maintenance operator that keeps a 100 TB ingest-append table
  * scannable (10^7 tiny files cost a listing + open per file and starve
  * the scheduler with sub-second tasks; the steady state every streaming
  * sink converges to without compaction).
  *
  * Planning is next-fit-decreasing bin packing: items sorted by
  * (bytes desc, name), then packed sequentially, opening a new bin when
  * the current one would overflow. NFD is within 2x of optimal, runs in
  * one ordered pass, and — unlike first-fit — is expressible as a pure
  * sequential fold, so the DuckDB oracle replays it exactly with a
  * recursive CTE (`q_compaction_plan`). The plan input is ONE ROW PER
  * FILE — metadata-sized, like the placement snapshot — so the
  * single-task ordered fold is the right shape at any data scale; only
  * the EXECUTION below touches data.
  *
  * Execution reads each planned bin and writes it back as one file.
  * Bins are independent, so they run as concurrent Spark jobs from a
  * driver-side pool (the Delta/Iceberg OPTIMIZE pattern): within a bin
  * the read is a normal multi-file parquet scan; across bins the cluster
  * is kept busy by job-level parallelism rather than one job with a
  * hash-collision-prone repartition by bin id.
  */
object Compaction {

  /** NFD packing of `(item, bytes)` rows into bins of `targetBytes`.
    * Deterministic: (bytes desc, item) order; an item larger than the
    * target gets a bin of its own. Returns `(bin_id, item, bytes)`. */
  def plan(items: DataFrame, targetBytes: Long): DataFrame = {
    val spark = items.sparkSession
    import spark.implicits._
    // null sizes (stats not yet collected) pack as zero — the bin is
    // re-measured at execution; a null must not kill the planner
    items.select(col("item").cast("string"),
        coalesce(col("bytes").cast("long"), lit(0L)).as("bytes"))
      .as[(String, Long)]
      .repartition(1)
      .sortWithinPartitions(col("bytes").desc, col("item"))
      .mapPartitions { it =>
        var bin = 0L; var acc = 0L; var first = true
        it.map { case (item, b) =>
          if (!first && acc + b > targetBytes) { bin += 1L; acc = 0L }
          first = false
          acc += b
          (bin, item, b)
        }
      }.toDF("bin_id", "item", "bytes")
  }

  /** One `(item=path, bytes)` row per data file under `path` (Hadoop FS
    * listing, so it works on any supported filesystem). */
  def listFiles(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet") &&
        !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
      .map(s => (s.getPath.toString, s.getLen))
      .sortBy(_._1)
    files.toSeq.toDF("item", "bytes")
  }

  /** Compact `inPath` into `outPath/bin=<id>/` with one file per bin,
    * `binJobs` bins in flight at once. Returns the executed plan. */
  def compactDirectory(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long, binJobs: Int = 8): DataFrame = {
    val planned = plan(listFiles(spark, inPath), targetBytes)
    val bins = planned.collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getString(1)).sorted).toMap
    val schema = spark.read.parquet(inPath).schema
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.max(1, math.min(binJobs, bins.size)))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    val jobs = bins.toSeq.sortBy(_._1).map { case (bin, files) =>
      scala.concurrent.Future {
        spark.read.schema(schema)
          .parquet(scala.collection.immutable.ArraySeq.unsafeWrapArray(files): _*)
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$outPath/bin=$bin")
      }
    }
    scala.concurrent.Await.result(
      scala.concurrent.Future.sequence(jobs),
      scala.concurrent.duration.Duration.Inf)
    pool.shutdown()
    planned
  }
}
