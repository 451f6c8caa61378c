package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object JumpRepro {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val mode = args.headOption.getOrElse("selfjoin")
    if (args.contains("noconstraints")) spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    var df = spark.range(10000).select(col("id").as("doc_id"),
      (col("id") / 2).cast("long").as("cluster_id")).localCheckpoint(true)
    for (i <- 1 to 25) {
      val t0 = System.nanoTime()
      val next = mode match {
        case "selfjoin" =>
          df.join(df.select(col("doc_id").as("cluster_id"), col("cluster_id").as("j")),
              Seq("cluster_id"), "left")
            .select(col("doc_id"), coalesce(col("j"), col("cluster_id")).as("cluster_id"))
            .localCheckpoint(true)
        case "twocheckpoints" =>
          // self-join where the right side is checkpointed AGAIN first
          val r = df.select(col("doc_id").as("cluster_id"), col("cluster_id").as("j"))
            .localCheckpoint(true)
          df.join(r, Seq("cluster_id"), "left")
            .select(col("doc_id"), coalesce(col("j"), col("cluster_id")).as("cluster_id"))
            .localCheckpoint(true)
        case "nojoin" =>
          df.select(col("doc_id"), (col("cluster_id") + 1).as("cluster_id"))
            .localCheckpoint(true)
      }
      df = next
      def psize(p: org.apache.spark.sql.catalyst.plans.physical.Partitioning): Int = p match {
        case c: org.apache.spark.sql.catalyst.plans.physical.PartitioningCollection => 1 + c.partitionings.map(psize).sum
        case _ => 1
      }
      val part = df.queryExecution.executedPlan.outputPartitioning
      println(s"[repro:$mode] iter $i ${(System.nanoTime() - t0) / 1000000} ms partSize=${psize(part)}")
    }
    spark.stop()
  }
}
