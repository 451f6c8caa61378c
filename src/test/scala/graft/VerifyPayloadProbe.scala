package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Verification
import graft.sources.MetaFixtures

/** Dev probe: where does placement_verify's wall time go?
  *
  *   A: full verifyBalancedOptimal (verdict + lazily-formatted reasons,
  *      per-block ip arrays carried through all three rollups)
  *   B: the same rollup chain with the ips payload and message columns
  *      stripped — verdict flags only
  *
  * If B ~= A the array payload is noise and the chain itself (one
  * repartition + three partition-local ObjectHashAggregates) is the
  * cost; if B << A the payload aggregation dominates and a
  * violated-only message join is worth building.
  *
  * Run: sbt "Test/runMain graft.VerifyPayloadProbe". Interleaved
  * best-of-3 each, same JVM.
  */
object VerifyPayloadProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val replicas = MetaFixtures.replicas(spark)
    val topology = MetaFixtures.topology(spark)
    val blocks = MetaFixtures.blocks(spark)

    def full(): DataFrame =
      Verification.verifyBalancedOptimal(replicas, topology, blocks)

    def stripped(): DataFrame = {
      val located = replicas.join(topology, "datanode_uuid")
      val hostsPerRack = topology.groupBy("dc", "rack").agg(count(lit(1)).as("available"))
      val racksPerDc = topology.groupBy("dc").agg(countDistinct("rack").as("available"))
      val nDcs = topology.agg(countDistinct(col("dc")).as("available"))
      val violated =
        when(col("leaf") <= col("available"), col("groups") =!= col("leaf"))
          .otherwise(col("groups") =!= col("available")) ||
          (col("max_placed") - col("min_placed") > 1)
      val vFlag = when(violated, 1).otherwise(0)
      val hosts = located
        .select(col("block_id"), col("dc"), col("rack"), col("datanode_uuid"))
        .repartition(col("block_id"))
        .groupBy("block_id", "dc", "rack", "datanode_uuid")
        .agg(count(lit(1)).as("cnt"))
      val rackLvl = hosts
        .groupBy("block_id", "dc", "rack")
        .agg(count(lit(1)).as("groups"), sum("cnt").as("leaf"),
          max("cnt").as("max_placed"), min("cnt").as("min_placed"))
        .join(broadcast(hostsPerRack), Seq("dc", "rack"))
        .select(col("block_id"), col("dc"), col("leaf").as("cnt"), vFlag.as("v"))
      val dcLvl = rackLvl
        .groupBy("block_id", "dc")
        .agg(count(lit(1)).as("groups"), sum("cnt").as("leaf"),
          max("cnt").as("max_placed"), min("cnt").as("min_placed"),
          max("v").as("v_below"))
        .join(broadcast(racksPerDc), Seq("dc"))
        .select(col("block_id"), col("leaf").as("cnt"),
          greatest(vFlag, col("v_below")).as("v"))
      val perBlock = dcLvl
        .groupBy("block_id")
        .agg(count(lit(1)).as("groups"), sum("cnt").as("leaf"),
          max("cnt").as("max_placed"), min("cnt").as("min_placed"),
          max("v").as("v_below"))
        .crossJoin(broadcast(nDcs))
        .select(col("block_id"),
          greatest(vFlag, col("v_below")).as("any_violation"),
          col("leaf").as("root_total"))
      blocks.join(perBlock, Seq("block_id"), "left")
        .select(col("block_id"),
          when(col("root_total").isNull ||
            col("root_total") < col("require_replica"), false)
            .when(col("any_violation") === 1, false)
            .otherwise(true).as("satisfied"))
    }

    def time(name: String, f: () => DataFrame): Unit = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      println(f"[verify-probe] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    (1 to 3).foreach { i =>
      time(s"full#$i", full _)
      time(s"stripped#$i", stripped _)
    }
    spark.stop()
  }
}
