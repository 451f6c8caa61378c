package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: A/B the co-purchase edge-relation spellings feeding
  * q_part_pagerank (and the same shape under q_part_triangles).
  *
  *   A: lineitem self-join on l_orderkey + distinct (current) — one
  *      shared exchange (ReusedExchange) + SMJ sorts + distinct exchange.
  *   B: groupBy(l_orderkey) collect_set + sorted in-array pair
  *      expansion + distinct — replaces the SMJ sorts with one
  *      aggregate, pairs expand narrowly from each order's array.
  *
  * Run: sbt "Test/runMain graft.EdgeBuildProbe [sfDir]". Interleaved
  * best-of-3 each, same JVM. */
object EdgeBuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")

    def edgesJoin(): DataFrame =
      li.as("a").join(li.as("b"), "l_orderkey")
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .where(col("u") < col("v"))
        .distinct()

    def edgesGrouped(): DataFrame =
      li.groupBy("l_orderkey")
        .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"""))
          .as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
        .distinct()

    def time(name: String, f: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f().count()
      println(f"[edge-probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    (1 to 3).foreach { i =>
      time(s"join#$i", edgesJoin _)
      time(s"grouped#$i", edgesGrouped _)
    }
    spark.stop()
  }
}
