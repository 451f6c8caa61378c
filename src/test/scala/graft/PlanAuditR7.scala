package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans of the round-7 queries.
  * sbt "Test/runMain graft.PlanAuditR7". */
object PlanAuditR7 {
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
      else Seq("q_dup_spans", "dedup_incremental_neardup",
        "q_embedding_dim_stats", "q_doc_length_quantiles_approx",
        "q_value_outliers_approx", "q_epoch_shuffle", "q_hybrid_retrieval",
        "placement_choose_favored", "q_weighted_sample",
        "q_dsir_sample", "q_corpus_drift", "q_curriculum_order",
        "q_ann_recall", "q_corpus_checksum", "q_length_buckets",
        "q_part_pagerank", "q_event_drift", "q_normalize_text",
        "q_train_val_test", "q_hard_negatives", "q_heavy_hitters_cms")
    for (name <- names) {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
