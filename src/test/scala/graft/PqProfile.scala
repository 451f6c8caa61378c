package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only PQ recall probe. sbt "Test/runMain graft.PqProfile". */
object PqProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.pipeline.{Pq, Similarity}
    val real = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pred = col("vec_id") % 100 === 0
    def asSet(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val exact = asSet(Similarity.bruteTopK(real, pred, k = 5))
    println(s"n=${real.count()} exact=${exact.size}")
    for ((m, k) <- Seq((8, 16), (16, 16))) {
      val pq = asSet(Pq.adcTopK(real, pred, k = 5, m = m, codebookSize = k))
      val recall = (exact & pq).size.toDouble / exact.size
      println(f"ADC      m=$m%3d k=$k%3d recall=$recall%.2f")
      for (sl <- Seq(25, 50, 100)) {
        val rr = asSet(Pq.adcRerankTopK(real, pred, k = 5, shortlist = sl,
          m = m, codebookSize = k))
        val rrec = (exact & rr).size.toDouble / exact.size
        println(f"rerank   m=$m%3d k=$k%3d sl=$sl%4d recall=$rrec%.2f")
      }
    }
    for ((np, sl, cb, ri) <- Seq((4, 50, 64, 2), (4, 100, 64, 2), (4, 50, 256, 2), (4, 100, 256, 0), (6, 100, 256, 2))) {
      val iv = asSet(Pq.ivfPqTopK(real, pred, k = 5, nprobe = np,
        codebookSize = cb, refineIters = ri))
      val ivr = asSet(Pq.ivfPqRerankTopK(real, pred, k = 5, shortlist = sl,
        nprobe = np, codebookSize = cb, refineIters = ri))
      println(f"ivfpq    np=$np%2d cb=$cb%3d ri=$ri%d adc_recall=${(exact & iv).size.toDouble / exact.size}%.2f" +
        f" rerank(sl=$sl%3d)=${(exact & ivr).size.toDouble / exact.size}%.2f")
    }
    spark.stop()
  }
}
