package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partition-level retention enforcement — the TTL half of table
  * maintenance (compaction keeps files healthy; this expires them):
  * on a hive-partitioned layout ([[Partitioned]]) with a time-like
  * partition column, expiry is a METADATA operation — list the
  * `col=value` directories, compare values against the cutoff, drop
  * whole directories. No data is read: at 100 TB, enforcing a 90-day
  * TTL costs a directory listing, not a scan — which is exactly why
  * time-partitioned layouts are the prerequisite for cheap retention
  * (row-level deletes on an unpartitioned table rewrite every file
  * they touch).
  *
  * Values compare NUMERICALLY when both sides parse as longs (day
  * numbers, epoch buckets), lexicographically otherwise (ISO dates —
  * where the two orders agree). `expire` returns the dropped plan so
  * callers can log/audit before the listing changes underneath them.
  * RetentionSpec pins the physical behavior; the day-cutoff arithmetic
  * itself is oracle-gated through `q_retention_expiry`'s logical twin.
  */
object Retention {

  /** `(value, n_files, bytes)` per `col=value` partition directory. */
  def listPartitions(spark: SparkSession, path: String,
      col: String): Seq[(String, Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(new org.apache.hadoop.fs.Path(path))
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$col="))
      .map { d =>
        val files = fs.listStatus(d.getPath).filter(_.isFile)
        (d.getPath.getName.stripPrefix(s"$col="),
          files.length.toLong, files.map(_.getLen).sum)
      }.toSeq.sortBy(_._1)
  }

  private def isBefore(v: String, cutoff: String): Boolean =
    (v.toLongOption, cutoff.toLongOption) match {
      case (Some(a), Some(b)) => a < b
      case _ => v < cutoff
    }

  /** Partitions strictly below the cutoff — the drop plan. */
  def expirationPlan(spark: SparkSession, path: String, col: String,
      cutoff: String): Seq[(String, Long, Long)] =
    listPartitions(spark, path, col).filter(p => isBefore(p._1, cutoff))

  /** Drop every partition directory strictly below the cutoff; returns
    * the executed plan. */
  def expire(spark: SparkSession, path: String, col: String,
      cutoff: String): Seq[(String, Long, Long)] = {
    val plan = expirationPlan(spark, path, col, cutoff)
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    plan.foreach { case (v, _, _) =>
      fs.delete(new org.apache.hadoop.fs.Path(path, s"$col=$v"), true)
    }
    plan
  }
}
