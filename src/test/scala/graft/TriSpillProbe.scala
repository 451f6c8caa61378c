package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 14): PER-STAGE spill attribution for
  * Triangles.perNode at scale — the TriWideAB result (spill unchanged,
  * 8.2 vs 8.4 GB, when the closing join stops sorting the wedge mass)
  * falsified "the wedge sort is the spill site"; this names the stage(s)
  * that actually spill. args: [wedgeParts], default -1 (auto). */
object TriSpillProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = mutable.ArrayBuffer[(Int, String, Long, Long, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val m = i.taskMetrics
        val ms = (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(-1L)
        stages += ((i.stageId, i.name.takeWhile(_ != '\n').take(60),
          m.memoryBytesSpilled + m.diskBytesSpilled,
          m.shuffleWriteMetrics.bytesWritten, ms, i.numTasks))
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    val wp = if (args.nonEmpty) args(0).toInt else -1
    def edges = {
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"), "l_orderkey")
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .where(col("u") < col("v"))
    }
    operators.Triangles.perNode(edges, "u", "v", wedgeParts = wp)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    println("[trispill] stageId spillMB shufWriteMB wallMs tasks name")
    stages.sortBy(-_._3).foreach { case (id, name, sp, sw, ms, nt) =>
      if (sp > 0 || sw > (64L << 20))
        println(s"[trispill] $id ${sp / (1L << 20)} ${sw / (1L << 20)} " +
          s"$ms $nt $name")
    }
    spark.stop()
  }
}
