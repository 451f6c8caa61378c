package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only profiler for the ANN query. sbt "Test/runMain graft.AnnProfile". */
object AnnProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Similarity
    val embs = Tables.embeddings(spark, "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }
    time("embs count")(embs.count())
    time("prepared count")(Similarity.prepared(embs).count())
    time("prepared collect") {
      import spark.implicits._
      Similarity.prepared(embs).as[Similarity.PreparedVec].collect().length
    }
    time("bruteTopK run 1")(
      Similarity.bruteTopK(embs, col("vec_id") % 50 === 0).count())
    time("bruteTopK run 2")(
      Similarity.bruteTopK(embs, col("vec_id") % 50 === 0).count())
    spark.stop()
  }
}
