package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.pipeline.Dedup
object NgramProfile {
  def t[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ngram] $label ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val hdf = Dedup.hashedShingleDf(docs).persist()
    t("hdf materialize")(println("  docs=" + hdf.count()))
    val ex = hdf.select(col("doc_id"), explode(col("hs")).as("s"))
    val rare = ex.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") <= 10)
    t("rare agg")(println("  rare=" + rare.count()))
    val rareEx = ex.join(rare.select("s"), "s")
    t("rareEx")(println("  rareEx=" + rareEx.count()))
    val cand = rareEx.toDF("s", "doc_a").join(rareEx.toDF("s", "doc_b"), "s")
      .where(col("doc_a") < col("doc_b")).select("doc_a", "doc_b").distinct()
    t("cand")(println("  cand=" + cand.count()))
    val inter = ex.toDF("doc_a", "s").join(cand, "doc_a")
      .join(ex.toDF("doc_b", "s"), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    t("inter")(println("  inter=" + inter.count()))
    spark.stop()
  }
}
