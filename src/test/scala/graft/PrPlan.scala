package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import scala.collection.mutable
/** Stage-width profiler (dev harness): flags stages > 800 ms running on
  * <= 8 tasks — the signature of a CPU-heavy pipeline serialized by a
  * narrow scan or an over-coalesced exchange (see util.Par scaladoc and
  * the round-13 continuation notes in PLANS.md). */
object PrPlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Int, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(-1L)
        stages += ((i.stageId, ms, i.numTasks))
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache(); Thread.sleep(300); stages.clear()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
      val tot = (System.nanoTime()-t0)/1e9
      Thread.sleep(300)
      val slow = stages.filter { case (_, ms, nt) => ms > 800 && nt <= 8 }
      println(f"[prof] $name tot=$tot%.2f s narrowSlow=${slow.size} " +
        slow.map { case (id, ms, nt) => s"(stage$id ${ms}ms ${nt}t)" }.mkString(" "))
    }
    spark.stop()
  }
}
