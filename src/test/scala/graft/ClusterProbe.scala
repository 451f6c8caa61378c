package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.logging.log4j.core.config.Configurator.setLevel("graft.pipeline", org.apache.logging.log4j.Level.INFO)
    val jobs = new AtomicInteger(); val stages = new AtomicInteger()
    val tasks = new AtomicInteger(); val taskMs = new AtomicLong()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = stages.incrementAndGet()
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskInfo != null) taskMs.addAndGet(t.taskInfo.duration)
      }
    })
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val pairs = graft.pipeline.Similarity.lshNearDup(
      Tables.embeddings(spark, dir), dim = 64, tauPct = 40)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).persist()
    println(s"[probe] pairs=${pairs.count()}")
    // wrap resolveClusters rounds indirectly: snapshot counters between log lines
    // simpler: poll from a thread every 500ms
    val t = new Thread(() => {
      while (true) {
        println(s"[ctr] t=${System.currentTimeMillis()} jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskMs=${taskMs.get}")
        Thread.sleep(2000)
      }
    })
    t.setDaemon(true); t.start()
    val t0 = System.nanoTime()
    val n = graft.pipeline.Dedup.resolveClusters(pairs).count()
    println(s"[probe] nodes=$n sec=${(System.nanoTime()-t0)/1e9} jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} taskMs=${taskMs.get}")
    spark.stop()
  }
}
