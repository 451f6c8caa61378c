package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Hive-style partitioned layout: write a table as
  * `<path>/<col>=<value>/part-*.parquet` so queries filtering on the
  * partition column never open non-matching directories — partition
  * pruning happens at FILE LISTING time, before any I/O, which at 100 TB
  * is the difference between touching one partition and scanning the
  * fleet. PartitionedSpec pins `PartitionFilters` in the scan and proves
  * the pruned read equals the filtered full read.
  */
object Partitioned {

  /** Write `df` partitioned by `cols` (low-cardinality columns only —
    * every distinct tuple becomes a directory). */
  def write(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(cols: _*).parquet(path)

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
