package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed-table layout: pre-shuffle a fact table ONCE at write time so
  * every later join/aggregation on the bucket key is exchange-free.
  *
  * At 100 TB this is the difference between shuffling the fact table on
  * every query and never shuffling it again: two tables bucketed by the
  * same key with the same bucket count sort-merge-join with ZERO Exchange
  * nodes, and a groupBy on the bucket key likewise rides the stored
  * partitioning. The write itself costs one repartition — amortized over
  * every subsequent query.
  *
  * The pre-write `repartition(buckets, key)` uses the same Murmur3
  * `pmod(hash, n)` placement as Spark's bucket-file assignment, so each
  * task holds exactly one bucket and each bucket lands in exactly ONE
  * file — which is what lets the scan report its output ordering (from
  * `sortBy`) and partitioning to the planner without a merge step.
  */
object Bucketed {

  /** Write `df` as a bucketed, per-bucket-sorted external parquet table,
    * replacing any previous version of `name`. */
  def writeBucketed(
      spark: SparkSession,
      df: DataFrame,
      name: String,
      path: String,
      key: String,
      buckets: Int): Unit = {
    df.repartition(buckets, col(key))
      .write
      .mode(SaveMode.Overwrite)
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(name)
  }

  /** Exchange-free equi-join of two tables bucketed on the join keys with
    * equal bucket counts. (The join itself is a plain `join` — the bucketed
    * scans are what remove the exchanges; this helper just documents and
    * centralizes the read side.) */
  def colocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame =
    spark.table(leftTable)
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
}
