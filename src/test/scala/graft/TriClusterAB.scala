package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev probe (round 14): the decisive arm for the wedge-plan decision —
  * Triangles default sort-merge close (wedgeParts = 0) vs the wide
  * streamed shuffle-hash close (auto), interleaved on a REAL 2-worker
  * local-cluster with constrained executor memory (the r13
  * cluster_100x_graph_pair arm: 20.3 GB spill at 22g executors vs
  * 8.6 GB in the one-JVM 48g arm). One-JVM 48g showed the two plans
  * spill-equal (the spill lives in the final explode+combine, not the
  * join) — this measures whether the cluster-side delta is the wedge
  * sort under tighter per-task memory.
  *
  *   SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
  *   GRAFT_SMOKE_WORKER_MB=22528 GRAFT_SMOKE_EXEC_MEM=22g \
  *   SPARK_GRAFT_SF_DIR=/tmp/graft_sf10 java -cp ... graft.TriClusterAB [n]
  */
object TriClusterAB {
  def main(args: Array[String]): Unit = {
    require(sys.env.contains("SPARK_HOME") && sys.env.contains("SPARK_SCALA_VERSION"),
      "needs SPARK_HOME and SPARK_SCALA_VERSION (see ClusterSmoke)")
    val repoClasses = new java.io.File("target/scala-2.13/classes").getAbsolutePath
    val master = s"local-cluster[2,16,${sys.env.getOrElse("GRAFT_SMOKE_WORKER_MB", "22528")}]"
    val spark = ClusterSmoke.session(master, repoClasses)
    spark.sparkContext.setLogLevel("WARN")
    val spill = new AtomicLong; val shufw = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
          shufw.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        }
      }
    })
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf10")
    def edges = {
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"), "l_orderkey")
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .where(col("u") < col("v"))
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "default" -> (() =>
        operators.Triangles.perNode(edges, "u", "v", wedgeParts = 0)),
      "wide" -> (() =>
        operators.Triangles.perNode(edges, "u", "v")))
    // executor warmup
    spark.range(10000000L).repartition(32).selectExpr("sum(id)").collect()
    def sig(df: DataFrame) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(node, n_triangles))")).head()
      (r.getLong(0), r.getLong(1))
    }
    val sigs = variants.map { case (name, f) =>
      spark.catalog.clearCache(); val s = sig(f()); println(s"[tricluster] sig $name $s"); s
    }
    require(sigs.distinct.size == 1, s"variant rows differ on the cluster: $sigs")
    def run(f: () => DataFrame): (Double, Long, Long) = {
      spark.catalog.clearCache()
      Thread.sleep(400); spill.set(0); shufw.set(0)
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400)
      (sec, spill.get, shufw.get)
    }
    val n = if (args.nonEmpty) args(0).toInt else 2
    val acc = variants.map { case (name, _) =>
      name -> Array.ofDim[(Double, Long, Long)](n) }.toMap
    (0 until n).foreach { i =>
      variants.foreach { case (name, f) => acc(name)(i) = run(f) }
      println(s"[tricluster] round$i " + variants.map { case (name, _) =>
        val (s, sp, sw) = acc(name)(i)
        f"$name=$s%.1fs/spill=${sp / (1L << 20)}MB/shufw=${sw / (1L << 20)}MB"
      }.mkString(" "))
    }
    println("[tricluster] BEST " + variants.map { case (name, _) =>
      val b = acc(name).minBy(_._1)
      f"$name=${b._1}%.1fs/spill=${b._2 / (1L << 20)}MB"
    }.mkString(" "))
    spark.stop()
  }
}
