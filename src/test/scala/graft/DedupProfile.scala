package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler for the minhash pipeline (Test scope; not part
  * of the shipped library). Run: sbt "Test/runMain graft.DedupProfile". */
object DedupProfile {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.pipeline.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0).persist()
    time("shingles materialize")(sh.count())
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s")).persist()
    time("explode materialize")(ex.count())
    val sig = sh.select(col("doc_id"), Dedup.minhashSignature(col("sh"), 32).as("sig"))
    time("signatures (HOF)")(sig.count())
    val banded = sig.select(col("doc_id"),
      explode(array((0 until 8).map { b =>
        struct(lit(b).as("band"), concat_ws("_", slice(col("sig"), b * 4 + 1, 4)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
    val buckets = banded.groupBy("band", "key").agg(collect_list("doc_id").as("ids"))
      .where(size(col("ids")).between(2, 64))
    val cand = buckets.select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .where(col("doc_a") < col("doc_b")).distinct().persist()
    time("banding+candidates")(println("cand pairs: " + cand.count()))
    val inter = ex.toDF("doc_a", "s").join(cand, "doc_a")
      .join(ex.toDF("doc_b", "s"), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    time("exact jaccard verify")(inter.count())
    time("full operator")(Dedup.minhashLshPairs(docs).count())
    spark.stop()
  }
}
