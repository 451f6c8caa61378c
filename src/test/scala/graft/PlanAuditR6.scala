package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans of the round-6 queries.
  * sbt "Test/runMain graft.PlanAuditR6". */
object PlanAuditR6 {
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
      else Seq("dedup_incremental_bloom", "q_lm_score", "q_pq_encode",
        "ann_pq_topk", "ann_ivfpq_topk", "q_interval_pairs",
        "q_chunk_overlap", "q_profile_lineitem", "q_funnel",
        "q_bucketed_join", "q_bm25_topk", "q_scd2_users", "q_event_cube",
        "q_zorder_layout", "q_part_triangles", "q_fuzzy_part_names",
        "q_retention", "q_table_diff", "q_event_transitions",
        "q_value_outliers", "q_constraints_orders")
    for (name <- names) {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
