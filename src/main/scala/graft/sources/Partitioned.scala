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

  /** Read with a DECLARED schema — the metastore convention. An empty
    * partitioned table has NO schema on disk (a zero-row `partitionBy`
    * write materializes no partition directories at all), so schema
    * inference fails exactly when a pipeline re-runs over an empty day;
    * production catalogs solve this by owning the schema, and so does
    * this overload: zero files read as a defined empty relation. */
  def read(spark: SparkSession, path: String,
           schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).parquet(path)
}
