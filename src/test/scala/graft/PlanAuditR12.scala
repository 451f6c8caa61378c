package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans of the registrations that postdate the
  * r10 registry-wide audit — r11's `multimodal_quarantine` and the
  * reshaped zone-map prune, r12's scale-proportional IVF gate and the
  * range-selection rewrite of `q_value_outliers`.
  * sbt "Test/runMain graft.PlanAuditR12". Assertion-grade pins live in
  * the specs (ZoneMapsSpec plan-pins both pruneDecision shapes,
  * QuantilesSpec pins exactRankStatistics against the window reference);
  * this is the eyeball pass for join strategy / filter pushdown /
  * exchange count / no data-sized collects. Findings recorded in
  * PLANS.md ("r12 plan audit"). */
object PlanAuditR12 {
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
      else Seq("multimodal_quarantine", "q_zonemap_prune",
        "q_zonemap_hilbert", "ann_ivf_scaled_topk", "q_value_outliers")
    for (name <- names) {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
