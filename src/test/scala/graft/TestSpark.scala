package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole test run.
  *
  * Master is `local[4,2]` (4 threads, maxFailures=2): task RETRIES are
  * enabled, which local mode otherwise disables. Nothing in the suite
  * fails spontaneously, so the only effect is that RetrySpec's injected
  * fail-once faults get the production retry path a real cluster has —
  * the determinism-under-retry gate needs it, and every other suite is
  * unaffected. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4,2]")
      .appName("graft-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
