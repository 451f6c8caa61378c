package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
/** Dev probe: triangle counting with the bloom wedge prune on vs off at
  * one scale (the TrianglesSpec equality gate proves same RESULTS; this
  * measures cost). Finding (sf0.1, r8): auto-bloom 6.8 s vs prune-off
  * 6.4 s best-of-3 — the sketch is cost-neutral at small scale and pays
  * from 10x up (PLANS.md r7 analysis); the r7->r8 wall-clock delta on
  * this query tracks the host calibration sentinel, not the operator. */
object TriProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def edges = {
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"), "l_orderkey")
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .where(col("u") < col("v"))
    }
    def time(tag: String)(f: => Unit): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        println(f"[tri] $tag run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.range(1000000).selectExpr("sum(id)").collect()
    time("bloom_auto") { operators.Triangles.perNode(edges, "u", "v").write.format("noop").mode("overwrite").save() }
    time("bloom_off") { operators.Triangles.perNode(edges, "u", "v", bloomBits = 0).write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
