package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump formatted plans of the registrations/reshapes that
  * postdate the r12 audit — the two standing-index refresh gates (their
  * build→refresh→admit pipelines) and the O(n)-trained kmeans rungs.
  * sbt "Test/runMain graft.PlanAuditR13". Assertion-grade pins live in
  * DedupSpec (refresh == rebuild relation-for-relation) and the oracle
  * gates; this is the eyeball pass for: the refresh merge join reusing
  * the standing buckets' partitioning (only the batch side exchanges),
  * probe joins staying equi-joins on the pre-capped postings, no
  * cartesians, no data-sized collects. Findings recorded in PLANS.md
  * ("Round-13 plan audit"). */
object PlanAuditR13 {
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
      else Seq("dedup_index_refresh", "multimodal_phash_index_refresh",
        "ann_ivf_kmeans_scaled_topk")
    for (name <- names) {
      println(s"\n===== $name =====")
      SparkEntry.queries(name)(spark, dir).explain("formatted")
    }
    // the refresh merge itself (the admit pipelines above only show the
    // post-refresh probe): does the full_outer bucket merge reuse the
    // standing side's hash partitioning?
    println("\n===== refreshNearDupIndex bucket merge (plan of the merged buckets relation) =====")
    val docs = Tables.documents(spark, dir)
    val idx0 = pipeline.Dedup.buildNearDupIndex(
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 10 < 2)
        .select("doc_id", "text"))
    val idx = pipeline.Dedup.refreshNearDupIndex(idx0,
      docs.where(org.apache.spark.sql.functions.col("doc_id") % 10 === 2)
        .select("doc_id", "text"))
    idx.buckets.explain("formatted")
    idx0.release(); idx.release()
    spark.stop()
  }
}
