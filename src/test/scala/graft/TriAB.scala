package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe: same-host A/B of the CURRENT Triangles.perNode against the
  * round-6 implementation (inlined below from commit 8932c32), answering
  * the r8 verdict's open attribution: is the r6 3.6 s -> r8 5.3 s
  * q_part_triangles wall-time delta host drift or an operator
  * regression? Both variants run INTERLEAVED in one JVM (best-of-5),
  * bracketed by calibration sentinels, so host drift cancels.
  *
  * r6 -> r8 operator deltas under test: `e.persist()` (extra cache
  * materialization), bloom transport (plan-literal -> SparkContext
  * broadcast), auto-size count source (oriented.count() -> cached
  * e.count()/hint), and the eager `localCheckpoint(true)` +
  * deterministic cache release on the result. */
object TriAB {

  /** The round-6 implementation, verbatim except the object name. */
  private def perNodeR6(edges: DataFrame, uCol: String, vCol: String,
      bloomBits: Int = -1, bloomHashes: Int = 5): DataFrame = {
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
    val spark = edges.sparkSession
    val maxBits = 1 << 27
    val bits: Long =
      if (bloomBits > 0) bloomBits.toLong
      else if (bloomBits == 0) 0L
      else {
        val target = oriented.count() * 10
        if (target > maxBits) 0L
        else math.max(1L << 20, java.lang.Long.highestOneBit(target - 1) << 1)
      }
    val prunedWedges =
      if (bits > 0 && spark.catalog.functionExists("graft_bloom_agg")) {
        val blob = oriented
          .agg(call_function("graft_bloom_agg",
            xxhash64(col("src"), col("dst")), lit(bits.toInt), lit(bloomHashes)))
          .head().getAs[Array[Byte]](0)
        wedges.where(call_function("graft_might_contain",
          lit(blob), xxhash64(col("d1"), col("d2"))))
      } else wedges
    val closing = oriented.select(col("src").as("d1"), col("dst").as("d2"))
    val triangles = prunedWedges.join(closing, Seq("d1", "d2"))
    triangles
      .select(explode(array(col("src"), col("d1"), col("d2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Current implementation with each r6->r8 delta toggleable, for
    * one-variable-at-a-time attribution. */
  private def perNodeVar(edges: DataFrame, persistE: Boolean,
      useHint: Long, ckpt: Boolean): DataFrame = {
    val e0 = edges
      .select(least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
    val e = if (persistE) e0.persist() else e0
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
    val spark = edges.sparkSession
    val maxBits = 1L << 30
    val edgesN = if (useHint > 0) useHint
      else if (persistE) e.count()
      else oriented.count()
    val target = edgesN * 10
    val bits =
      if (target <= maxBits)
        math.max(1L << 20, java.lang.Long.highestOneBit(target - 1) << 1)
      else maxBits
    val blob = oriented
      .agg(call_function("graft_bloom_agg",
        xxhash64(col("src"), col("dst")), lit(bits.toInt), lit(5)))
      .head().getAs[Array[Byte]](0)
    val bc = spark.sparkContext.broadcast(blob)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val probe = ColumnBridge.column(
      graft.functions.BloomMightContainBc(bc,
        ColumnBridge.expression(xxhash64(col("d1"), col("d2")))))
    val pruned = wedges.where(probe)
    val closing = oriented.select(col("src").as("d1"), col("dst").as("d2"))
    val result = pruned.join(closing, Seq("d1", "d2"))
      .select(explode(array(col("src"), col("d1"), col("d2"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
    if (ckpt) {
      val out = result.localCheckpoint(true)
      oriented.unpersist()
      if (persistE) e.unpersist()
      bc.destroy()
      out
    } else result
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def edges = {
      val li = Tables.lineitem(spark, dir).select("l_orderkey", "l_partkey")
      li.as("a").join(li.as("b"), "l_orderkey")
        .select(col("a.l_partkey").as("u"), col("b.l_partkey").as("v"))
        .where(col("u") < col("v"))
    }
    def sentinel(): Double = {
      val t0 = System.nanoTime()
      spark.range(200000000L).selectExpr("sum(id * 3 + 1)").collect()
      (System.nanoTime() - t0) / 1e9
    }
    def run(df: => DataFrame): Double = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "r6" -> (() => perNodeR6(edges, "u", "v")),
      "current" -> (() => operators.Triangles.perNode(edges, "u", "v")),
      // one-variable-at-a-time deltas off the current shape:
      "cur_noPersistE" -> (() => perNodeVar(edges, persistE = false,
        useHint = -1L, ckpt = true)),
      "cur_noCkpt" -> (() => perNodeVar(edges, persistE = true,
        useHint = -1L, ckpt = false)),
      "cur_hint" -> (() => perNodeVar(edges, persistE = true,
        useHint = 1000000L, ckpt = true)),
      "cur_minimal" -> (() => perNodeVar(edges, persistE = false,
        useHint = 1000000L, ckpt = false)))
    // warm every code path once
    variants.foreach { case (_, f) => run(f()) }
    println(f"[triab] sentinel_pre ${sentinel()}%.3f s")
    val n = 4
    val times = variants.map { case (name, _) => name -> Array.ofDim[Double](n) }.toMap
    (0 until n).foreach { i =>
      variants.foreach { case (name, f) => times(name)(i) = run(f()) }
      println(s"[triab] round$i " + variants.map { case (name, _) =>
        f"$name=${times(name)(i)}%.2f" }.mkString(" "))
    }
    println(f"[triab] sentinel_post ${sentinel()}%.3f s")
    println("[triab] BEST " + variants.map { case (name, _) =>
      f"$name=${times(name).min}%.2f" }.mkString(" "))
    println("[triab] MED  " + variants.map { case (name, _) =>
      f"$name=${times(name).sorted.apply(n / 2)}%.2f" }.mkString(" "))
    spark.stop()
  }
}
