package graft
import org.apache.spark.sql.SparkSession
import graft.sources.MetaFixtures
import graft.sources.MetaFixtures.{SparkDialect, replicaCols, replicaFilter, blockCols}
import graft.operators.Verification
/** Dev-only scale smoke: the verification operator at 1x and 10x fixture
  * size — evidence the single-shuffle plan scales linearly.
  * Run: sbt "Test/runMain graft.ScaleSmoke". */
object ScaleSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val topo = MetaFixtures.topology(spark)
    Seq(1L, 10L).foreach { mult =>
      val nBlocks = MetaFixtures.NumBlocks * mult
      val replicas = spark.range(0, nBlocks * 5)
        .where(replicaFilter("id", SparkDialect))
        .selectExpr(replicaCols("id", SparkDialect): _*)
      val blocks = spark.range(0, nBlocks).selectExpr(blockCols("id"): _*)
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = Verification.verifyBalancedOptimal(replicas, topo, blocks).count()
        println(f"[scale] ${mult}x run$i: $n%d blocks verified in ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    // cluster resolution at 1x and 10x edge count: synthetic near-clique
    // components (1000 edges per 100-node clique group at 1x) — evidence
    // the per-round single-shuffle label propagation scales linearly
    Seq(1L, 10L).foreach { mult =>
      val nEdges = 100000L * mult
      val edges = spark.range(0, nEdges).selectExpr(
        // component id = id div 1000; members within component chosen by LCG
        s"(id div 1000) * 100 + ${MetaFixtures.prand("id * 3 + 1")} % 100 AS doc_a",
        s"(id div 1000) * 100 + ${MetaFixtures.prand("id * 5 + 2")} % 100 AS doc_b")
        .where("doc_a <> doc_b")
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val n = graft.pipeline.Dedup.resolveClusters(edges).count()
        println(f"[scale] cc ${mult}x run$i: $n%d labels in ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
