package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named queries to files — the plan
  * evidence the optimization rounds commit under `plans/r{N}/`.
  *
  * Usage: Test/runMain graft.PlanDump <outDir> <suffix> <query> [query...]
  * writes `<outDir>/<query>_<suffix>.txt` for each name. Queries with
  * build side effects run them (the dumped plan is the serve query's). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "PlanDump <outDir> <suffix> <query> [query...]")
    val outDir = args(0); val suffix = args(1); val names = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      // capture mode: checkpoint-tail operators keep their full lazy
      // pipeline, so the dump shows the real plan instead of an
      // ExistingRDD scan (util.PlanCapture scaladoc)
      val df = graft.util.PlanCapture.capture {
        SparkEntry.queries(name)(spark, sfDir)
      }
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
