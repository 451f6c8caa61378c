package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 14): same-JVM interleaved A/B of the wedge-exchange
  * sizing in Triangles.perNode — `wedgeParts = 0` (the certified
  * default-width sort-merge closing plan) vs auto (wide repartition on
  * (d1, d2) + shuffle-hash close built on the edge side, engaged above
  * [[graft.operators.Triangles.WedgeWidenMinEdges]]). Reports wall plus
  * per-run shuffle SPILL bytes: the r13 100x evidence put the wedge sort's
  * spill at 8.6 GB in a 48g one-JVM arm and 20.3 GB on the half-memory
  * 2-worker cluster, so run this with -Xmx sized to the arm under study.
  * Rows are asserted equal between variants before any timing.
  */
object TriWideAB {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val spill = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) spill.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
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

    // row equality first (also warms both code paths)
    def sig(df: DataFrame): (Long, Long, Long) = {
      val r = df.agg(count(lit(1)),
        expr("bit_xor(xxhash64(node, n_triangles))"),
        sum(col("n_triangles"))).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    val sigs = variants.map { case (name, f) =>
      spark.catalog.clearCache(); val s = sig(f()); println(s"[triwide] sig $name $s"); s
    }
    require(sigs.distinct.size == 1, s"variant rows differ: $sigs")

    def run(f: () => DataFrame): (Double, Long) = {
      spark.catalog.clearCache()
      Thread.sleep(300); spill.set(0)
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      (sec, spill.get)
    }
    val n = if (args.nonEmpty) args(0).toInt else 3
    val acc = variants.map { case (name, _) =>
      name -> Array.ofDim[(Double, Long)](n) }.toMap
    (0 until n).foreach { i =>
      variants.foreach { case (name, f) => acc(name)(i) = run(f) }
      println(s"[triwide] round$i " + variants.map { case (name, _) =>
        val (s, sp) = acc(name)(i); f"$name=$s%.1fs/spill=${sp / (1L << 20)}MB"
      }.mkString(" "))
    }
    println("[triwide] BEST " + variants.map { case (name, _) =>
      val best = acc(name).minBy(_._1)
      f"$name=${best._1}%.1fs/spill=${best._2 / (1L << 20)}MB"
    }.mkString(" "))
    spark.stop()
  }
}
