package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans of the round-8 queries.
  * sbt "Test/runMain graft.PlanAuditR8". Assertion-grade pins live in
  * the operator specs (zero-exchange text passes, spectral's single
  * exchange, blocklist's narrow scan, histogram's one value shuffle);
  * this is the eyeball pass for pushed filters / broadcast choices. */
object PlanAuditR8 {
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
      else Seq("q_repetition_stats", "q_tfidf_top", "q_zonemap_prune",
        "q_zonemap_hilbert", "q_compaction_plan", "q_hilbert_layout",
        "q_spectral_direction", "q_join_size_estimate",
        "q_blocklist_screen", "q_phrase_search", "q_incremental_agg",
        "dedup_snm_pairs", "q_value_histogram", "q_salt_advisor",
        "q_retention_expiry")
    for (name <- names) {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
