package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans of the round-10 queries.
  * sbt "Test/runMain graft.PlanAuditR10". Assertion-grade pins live in
  * the specs (ZoneMapsSpec's single joined candidate collect,
  * DedupSpec's banded-pairs exactness, MultimodalSpec's hash
  * invariances); this is the eyeball pass for join strategy / filter
  * pushdown / exchange count on the new registrations. */
object PlanAuditR10 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q_attribution_outer", "multimodal_phash",
        "multimodal_phash_pairs", "q_value_histogram_approx",
        "q_zonemap_prune")
    for (name <- names) {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
