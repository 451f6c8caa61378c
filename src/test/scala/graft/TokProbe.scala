package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Paired A/B probe: native byte-scan tokenizer vs the regex spelling it
  * replaced, interleaved in one JVM so ambient host drift cancels.
  * Shapes: bare tokenize projection, and the BM25-build explode+aggregate
  * (the dominant consumer). */
object TokProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save() // page-cache warm

    def native(c: org.apache.spark.sql.Column) = pipeline.TextAnalysis.tokens(c)
    def regex(c: org.apache.spark.sql.Column) = pipeline.TextAnalysis.tokensRegex(c)

    def proj(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      docs.select(col("doc_id"), tok(col("text")).as("toks"))
    def bm25build(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      docs.select(col("doc_id"), explode(tok(col("text"))).as("term"))
        .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    def shingle(tok: org.apache.spark.sql.Column => org.apache.spark.sql.Column): DataFrame =
      docs.select(col("doc_id"), tok(col("text")).as("toks"))
        .select(col("doc_id"),
          pipeline.Dedup.shinglesFromTokens(col("toks")).as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n"))

    def time(df: => DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val shapes: Seq[(String, (org.apache.spark.sql.Column => org.apache.spark.sql.Column) => DataFrame)] =
      Seq(("proj", proj), ("bm25build", bm25build), ("shingle", shingle))
    // warm both codegen paths
    shapes.foreach { case (_, f) => time(f(native)); time(f(regex)) }
    for ((name, f) <- shapes) {
      val n = (1 to 3).map(_ => time(f(native))).min
      val r = (1 to 3).map(_ => time(f(regex))).min
      println(f"[tokprobe] $name%-10s native=$n%.3f regex=$r%.3f speedup=${r / n}%.2fx")
    }
    spark.stop()
  }
}
