package graft

import org.apache.spark.sql.SparkSession

/** Dev-only physical-plan audit: prints the formatted plan of selected
  * queries so scan pushdown (PushedFilters/ReadSchema), broadcast joins and
  * WholeStageCodegen spans can be inspected.
  * Run: sbt "Test/runMain graft.PlanAudit [query ...]". */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing", "q3_top_orders", "placement_verify")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
