package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (TriAB discipline): same-JVM interleaved A/B of the CURRENT
  * Triangles.perNode (shuffled-hash degree joins) against an inlined
  * variant identical except the degree joins stay sort-merge — answering
  * whether the r17 SHJ hint is a win or host drift at the 100x copy.
  * Variants alternate run-for-run so drift cancels.
  */
object TriHintAB {

  /** Current perNode minus the shuffle_hash hints on the degree joins —
    * everything else (wedge projection, sizing, bloom) identical. */
  private def perNodeSmj(edges: DataFrame, uCol: String, vCol: String): DataFrame = {
    val e = edges
      .select(least(col(uCol), col(vCol)).as("u"),
        greatest(col(uCol), col(vCol)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val deg = e.select(col("u").as("node"))
      .unionAll(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val oriented = e
      .join(deg.withColumnRenamed("node", "u").withColumnRenamed("deg", "du"), "u")
      .join(deg.withColumnRenamed("node", "v").withColumnRenamed("deg", "dv"), "v")
      .select(
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("u"))
          .otherwise(col("v")).as("src"),
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("v"))
          .otherwise(col("u")).as("dst"),
        when(col("du") < col("dv") ||
            (col("du") === col("dv") && col("u") < col("v")), col("dv"))
          .otherwise(col("du")).as("ddst"))
      .persist()
    val a1 = oriented.select(col("src"), col("dst").as("d1"), col("ddst").as("dd1"))
    val a2 = oriented.select(col("src"), col("dst").as("d2"), col("ddst").as("dd2"))
    val wedges = a1.join(a2, "src")
      .where(col("dd1") < col("dd2") ||
        (col("dd1") === col("dd2") && col("d1") < col("d2")))
      .select("src", "d1", "d2")
    val spark = edges.sparkSession
    val maxBits = 1L << 30
    lazy val edgesN: Long = oriented.count()
    val (bits: Long, pruneOn: Boolean) = {
      val target = edgesN * 10
      if (target <= maxBits)
        (math.max(1L << 20, java.lang.Long.highestOneBit(target - 1) << 1), true)
      else if (maxBits >= edgesN * 4) (maxBits, true)
      else (0L, false)
    }
    val prunedWedges =
      if (pruneOn && spark.catalog.functionExists("graft_bloom_agg")) {
        val blob = oriented
          .agg(call_function("graft_bloom_agg",
            xxhash64(col("src"), col("dst")), lit(bits.toInt), lit(5)))
          .head().getAs[Array[Byte]](0)
        val bc = spark.sparkContext.broadcast(blob)
        import org.apache.spark.sql.graftbridge.ColumnBridge
        val probe = ColumnBridge.column(
          graft.functions.BloomMightContainBc(bc,
            ColumnBridge.expression(xxhash64(col("d1"), col("d2")))))
        (wedges.where(probe), Some(bc))
      } else (wedges, None)
    val targetW: Int =
      if (edgesN < operators.Triangles.WedgeWidenMinEdges) 0
      else {
        val ub = oriented.groupBy("src").agg(count(lit(1)).as("k"))
          .agg(coalesce(sum(expr("(k * (k - 1)) div 2")), lit(0L))
            .cast("long").as("w"))
          .head().getLong(0)
        val w = math.ceil(ub * operators.Triangles.WedgeRowBytes.toDouble /
          operators.Triangles.WedgeTargetPartitionBytes).toLong
        math.min(4096L, math.max(
          spark.sessionState.conf.numShufflePartitions.toLong, w)).toInt
      }
    val closing = oriented.select(col("src").as("d1"), col("dst").as("d2"))
    val triangles =
      if (targetW > 0)
        prunedWedges._1.repartition(targetW, col("d1"), col("d2"))
          .join(closing.hint("shuffle_hash"), Seq("d1", "d2"))
      else prunedWedges._1.join(closing, Seq("d1", "d2"))
    val result = triangles
      .select(explode(array(col("src"), col("d1"), col("d2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    val out = result.localCheckpoint(true)
    oriented.unpersist()
    prunedWedges._2.foreach(_.destroy())
    out
  }

  def main(args: Array[String]): Unit = {
    val reps = sys.env.getOrElse("GRAFT_AB_REPS", "3").toInt
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    def edges() = {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
      li.groupBy("l_orderkey")
        .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(explode(expr(
          """flatten(transform(ps, (x, i) ->
             transform(slice(ps, i + 2, size(ps)), y -> struct(x AS u, y AS v))))"""))
          .as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
    }
    def time(f: => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warmup both variants once (JIT), then alternate
    time(operators.Triangles.perNode(edges(), "u", "v"))
    time(perNodeSmj(edges(), "u", "v"))
    val a = Array.fill(reps)(0.0)
    val b = Array.fill(reps)(0.0)
    for (i <- 0 until reps) {
      a(i) = time(operators.Triangles.perNode(edges(), "u", "v"))
      println(f"[triab] shj rep${i + 1} ${a(i)}%.2f s")
      b(i) = time(perNodeSmj(edges(), "u", "v"))
      println(f"[triab] smj rep${i + 1} ${b(i)}%.2f s")
    }
    println(f"[triab] SHJ best=${a.min}%.2f med=${a.sorted.apply(reps / 2)}%.2f | " +
      f"SMJ best=${b.min}%.2f med=${b.sorted.apply(reps / 2)}%.2f")
    spark.stop()
  }
}
