package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Curation

/** Skewed-layout 10x probe for the text operators (PLANS.md round-8):
  * rewrites 5% of the amplified 10x documents to one shared 950-token
  * passage, so that ONE document class holds ~50% of the corpus tokens
  * and every window hash inside it repeats ~2500x — the layout the
  * uniform ScaleUp sweeps never produce. Reports best-of-3 wall time,
  * spill, and the worst single-task shuffle-read share of any
  * consequential stage for `duplicateSpans` and `epochShuffle` on the
  * uniform vs skewed corpus.
  *
  * Usage: first materialize /tmp/graft_sf1 with [[ScaleUp]], then
  *   sbt -batch "Test/runMain graft.SkewProbe"
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val srcDir = if (args.length > 0) args(0) else "/tmp/graft_sf1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val spillMem = new AtomicLong; val spillDisk = new AtomicLong
    val reads = new ConcurrentHashMap[Int, List[(Long, Long)]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
          val r = m.shuffleReadMetrics
          reads.merge(t.stageId,
            List((r.recordsRead, r.totalBytesRead)),
            (a, b) => b ::: a)
        }
      }
    })
    spark.range(1000000).selectExpr("sum(id)").collect() // warm codegen

    val uniform = spark.read.parquet(s"$srcDir/documents.parquet")
    // hot class: every 20th doc -> the same 950-token passage (~50% of
    // all tokens); written out so the probe measures a scan-shaped input
    val hot = (0 until 950).map(i => s"hotword$i").mkString(" ")
    val skewDir = "/tmp/graft_skew10"
    uniform
      .withColumn("text",
        when(col("doc_id") % 20 === 0, lit(hot)).otherwise(col("text")))
      .withColumn("n_chars", length(col("text")))
      .repartition(10)
      .write.mode("overwrite").parquet(s"$skewDir/documents.parquet")
    val skewed = spark.read.parquet(s"$skewDir/documents.parquet")

    def probe(tag: String, run: () => Unit): Unit =
      (1 to 3).foreach { i =>
        Thread.sleep(300)
        spillMem.set(0); spillDisk.set(0); reads.clear()
        val t0 = System.nanoTime()
        run()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(500)
        // worst one-task record share over ADVISORY-SIZED exchanges
        // (>=8 MB at probe scale; the 64 MB advisory governs a real corpus):
        // below that, AQE deliberately coalesces the whole exchange into
        // one partition, which is rightsizing, not a straggler
        val stages = reads.asScala.toMap.map { case (_, tasks) =>
          (tasks.map(_._1).sum, tasks.map(_._2).sum,
            tasks.map(_._1).max.toDouble / math.max(1L, tasks.map(_._1).sum))
        }
        val big = stages.filter(_._2 >= 8L * 1024 * 1024)
        val worst = if (big.isEmpty) 0.0 else big.map(_._3).max
        val biggestMB = if (stages.isEmpty) 0L
          else stages.map(_._2).max / (1024 * 1024)
        println(f"[skewprobe] $tag run$i $sec%.2f s " +
          f"spill_mem=${spillMem.get} spill_disk=${spillDisk.get} " +
          f"worst_task_share=$worst%.2f biggest_exchange_mb=$biggestMB")
      }

    for ((tag, df) <- Seq("uniform" -> uniform, "skewed" -> skewed)) {
      probe(s"dup_spans_$tag", () =>
        Curation.duplicateSpans(df, w = 8, maxCount = 1)
          .write.format("noop").mode("overwrite").save())
      probe(s"epoch_shuffle_$tag", () =>
        Curation.epochShuffle(df, col("doc_id"), epoch = 3, nShards = 64)
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
