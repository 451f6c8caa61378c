package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val pairs = graft.pipeline.Similarity.lshNearDup(
        Tables.embeddings(spark, dir), dim = 64, tauPct = 40)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")).persist()
      val np = pairs.count()
      val t0 = System.nanoTime()
      val labels = graft.pipeline.Dedup.resolveClusters(pairs)
      val nv = labels.count()
      val t1 = (System.nanoTime() - t0) / 1e9
      val comp = labels.groupBy("cluster_id").count()
        .agg(count(lit(1)), max("count")).head()
      println(s"[probe] $dir pairs=$np nodes=$nv resolve_sec=$t1 " +
        s"components=${comp.getLong(0)} max_component=${comp.getLong(1)}")
      pairs.unpersist()
    }
    spark.stop()
  }
}
