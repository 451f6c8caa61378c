package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Similarity

class GraftFunctionsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft_dot is registered by GraftExtensions and usable from SQL") {
    assert(spark.catalog.functionExists("graft_dot"))
    val r = spark.sql(
      "SELECT graft_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head()
    assert(r.getLong(0) == 4 + 10 + 18)
  }

  test("native expression agrees with the higher-order fallback") {
    val df = Seq(
      (1L, Seq(1L, -2L, 3L), Seq(10L, 20L, 30L)),
      (2L, Seq(0L, 0L), Seq(5L, 7L)),
      (3L, Seq(1000000L, 2000000L), Seq(3000000L, 1L)) // large products
    ).toDF("id", "a", "b")
    val rows = df.select(col("id"),
        call_function("graft_dot", col("a"), col("b")).as("native"),
        Similarity.dotLong(col("a"), col("b")).as("hof"))
      .collect()
    rows.foreach(r => assert(r.getLong(1) == r.getLong(2), s"id=${r.getLong(0)}"))
  }

  test("length mismatch: native min-zips where zip_with would null-pad") {
    // divergence is intentional and documented; pipeline arrays are always
    // equal-length (fixed embedding dim)
    val df = Seq((Seq(1L, 2L, 3L), Seq(1L, 2L))).toDF("a", "b")
    val r = df.select(
      call_function("graft_dot", col("a"), col("b")).as("native"),
      Similarity.dotLong(col("a"), col("b")).as("hof")).head()
    assert(r.getLong(0) == 5L)
    assert(r.isNullAt(1))
  }

  test("graft_dot participates in whole-stage codegen") {
    val df = spark.range(100)
      .selectExpr("graft_dot(array(id, id), array(2L, 3L)) AS d")
    val hasWsc = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    assert(df.agg(sum("d")).head().getLong(0) == (0L until 100).map(i => i * 5).sum)
  }

  test("null arrays propagate null") {
    val r = spark.sql("SELECT graft_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L))").head()
    assert(r.isNullAt(0))
  }

  test("graft_topk agrees with the window top-k on random distributed data") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val df = spark.range(0, 5000)
      .selectExpr("id % 7 AS g", "CAST((id * 2654435761) % 99991 AS BIGINT) AS v")
      .repartition(16)
    val viaAgg = df.groupBy("g")
      .agg(call_function("graft_topk", col("v"), lit(4)).as("top"))
      .select(col("g"), posexplode(col("top")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val viaWindow = df.withColumn("rn", row_number().over(
        Window.partitionBy("g").orderBy(col("v").desc)))
      .where(col("rn") <= 4)
      .select(col("g"), (col("rn") - 1).cast("int").as("pos"), col("v"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
  }

  test("graft_topk keeps duplicate boundary values and short groups") {
    import org.apache.spark.sql.functions._
    val df = Seq((1L, 9L), (1L, 9L), (1L, 9L), (1L, 1L), (2L, 5L))
      .toDF("g", "v")
    val got = df.groupBy("g")
      .agg(call_function("graft_topk", col("v"), lit(2)).as("top"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got(1L) == Seq(9L, 9L))
    assert(got(2L) == Seq(5L))
  }

  // --- graft_bloom_agg / graft_might_contain ---

  private def bloomOver(df: org.apache.spark.sql.DataFrame, bits: Int,
                        hashes: Int): Array[Byte] =
    df.agg(call_function("graft_bloom_agg", col("v"), lit(bits), lit(hashes)))
      .head().getAs[Array[Byte]](0)

  test("bloom: no false negatives over distributed random inserts") {
    val df = spark.range(0, 20000)
      .selectExpr("CAST(id * 2654435761 + 17 AS BIGINT) AS v")
      .repartition(16)
    val blob = bloomOver(df, 1 << 18, 5)
    val misses = df.where(
      !call_function("graft_might_contain", lit(blob), col("v"))).count()
    assert(misses == 0L)
  }

  test("bloom: blob is a pure function of the value set (merge-order invariant)") {
    val vals = spark.range(0, 5000).selectExpr("CAST(id * 97 AS BIGINT) AS v")
    val a = bloomOver(vals.repartition(1), 1 << 14, 4)
    val b = bloomOver(vals.repartition(32), 1 << 14, 4)
    val c = bloomOver(vals.union(vals).repartition(7), 1 << 14, 4) // idempotent
    assert(java.util.Arrays.equals(a, b))
    assert(java.util.Arrays.equals(a, c))
  }

  test("bloom: false-positive rate is in the expected band, not saturated") {
    // 20k keys into 2^18 bits / 5 hashes -> theoretical fp ~ 0.04%; assert
    // the orders of magnitude: far below 5%, and > 0 probes pass so the
    // filter is not degenerate-empty either way
    val members = spark.range(0, 20000).selectExpr("CAST(id * 31 + 5 AS BIGINT) AS v")
    val blob = bloomOver(members, 1 << 18, 5)
    val nonMembers = spark.range(0, 20000)
      .selectExpr("CAST(-(id * 131 + 7) AS BIGINT) AS v")
    val fp = nonMembers.where(
      call_function("graft_might_contain", lit(blob), col("v"))).count()
    assert(fp < 1000L, s"false-positive count $fp out of 20000 is saturated")
  }

  test("graft_might_contain participates in whole-stage codegen") {
    val blob = bloomOver(
      spark.range(0, 100).selectExpr("CAST(id AS BIGINT) AS v"), 1 << 10, 3)
    val df = spark.range(0, 1000)
      .where(call_function("graft_might_contain", lit(blob), col("id")))
    val hasWsc = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    // all 100 members pass; any extras are false positives, never misses
    assert(df.count() >= 100L)
  }

  test("bloom: null values are skipped on insert, null probe yields null") {
    val blob = Seq(Some(1L), None, Some(2L)).toDF("v")
      .agg(call_function("graft_bloom_agg", col("v"), lit(1 << 10), lit(3)))
      .head().getAs[Array[Byte]](0)
    assert(graft.functions.LongBloom.contains(blob, 1L) &&
      graft.functions.LongBloom.contains(blob, 2L))
    val r = Seq(Option.empty[Long]).toDF("v")
      .select(call_function("graft_might_contain", lit(blob), col("v"))).head()
    assert(r.isNullAt(0))
  }

  test("bloom: invalid sizes are rejected at analysis time") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("id AS v")
        .agg(call_function("graft_bloom_agg", col("v"), lit(0), lit(3))).head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("id AS v")
        .agg(call_function("graft_bloom_agg", col("v"), lit(1 << 10), lit(0))).head()
    }
  }

  test("cms: estimates never undercount, and equal exact counts when the " +
      "width dominates the key cardinality") {
    val vals = (1L to 500L).flatMap(v => Seq.fill((v % 7 + 1).toInt)(v))
    val df = vals.toDF("v").repartition(11)
    val wide = df.agg(call_function("graft_cms_agg", col("v"), lit(4),
      lit(1 << 16))).head().getAs[Array[Byte]](0)
    val narrow = df.agg(call_function("graft_cms_agg", col("v"), lit(4),
      lit(32))).head().getAs[Array[Byte]](0)
    val exact = vals.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for ((v, n) <- exact) {
      assert(graft.functions.LongCms.estimate(wide, v) == n,
        s"wide sketch must be exact for $v")
      assert(graft.functions.LongCms.estimate(narrow, v) >= n,
        s"narrow sketch must never undercount $v")
    }
  }

  test("cms: blob is a pure function of the value multiset " +
      "(partitioning/merge-order invariant)") {
    val vals = (1L to 300L) ++ (1L to 300L by 3)
    val a = vals.toDF("v").repartition(1)
      .agg(call_function("graft_cms_agg", col("v"), lit(3), lit(64)))
      .head().getAs[Array[Byte]](0)
    val b = vals.reverse.toDF("v").repartition(17)
      .agg(call_function("graft_cms_agg", col("v"), lit(3), lit(64)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("graft_cms_estimate participates in whole-stage codegen") {
    val blob = spark.range(100).selectExpr("id AS v")
      .agg(call_function("graft_cms_agg", col("v"), lit(2), lit(64)))
      .head().getAs[Array[Byte]](0)
    val probed = spark.range(10)
      .select(call_function("graft_cms_estimate", lit(blob), col("id")).as("e"))
    val hasWsc = probed.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, probed.queryExecution.executedPlan.toString)
    assert(probed.collect().forall(_.getLong(0) >= 1L))
  }

  test("cms: null values are skipped on insert, null probe yields null") {
    val blob = Seq(Some(1L), None, Some(1L)).toDF("v")
      .agg(call_function("graft_cms_agg", col("v"), lit(2), lit(64)))
      .head().getAs[Array[Byte]](0)
    assert(graft.functions.LongCms.estimate(blob, 1L) == 2L)
    val nullProbe = Seq(Some(1L), None).toDF("v")
      .crossJoin(Seq(1).toDF("one"))
      .withColumn("blob", lit(blob))
      .selectExpr("graft_cms_estimate(blob, v) AS e")
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(nullProbe.toSet == Set(Some(2L), None))
  }

  test("cms: invalid depth/width rejected at analysis time") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("id AS v")
        .agg(call_function("graft_cms_agg", col("v"), lit(0), lit(64))).head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).selectExpr("id AS v")
        .agg(call_function("graft_cms_agg", col("v"), lit(4), lit(1))).head()
    }
  }

  // ---------------------------------------------------------------
  // HyperLogLog distinct sketch
  // ---------------------------------------------------------------

  test("hll: estimate tracks the exact distinct count within the " +
      "standard error band across cardinality regimes") {
    // sigma ~ 1.04/sqrt(m); assert 5 sigma so the test pins quality
    // without flaking on one awkward cardinality
    val p = 11
    val tol = 5 * 1.04 / math.sqrt((1 << p).toDouble)
    for (n <- Seq(50L, 1000L, 20000L)) {
      val est = spark.range(n)
        .select((col("id") * 7919L + 17L).as("v")) // arbitrary spread ids
        .agg(call_function("graft_hll_agg", col("v"), lit(p)))
        .head().getAs[Array[Byte]](0)
      val e = graft.functions.LongHll.estimate(est)
      assert(math.abs(e - n).toDouble / n <= tol,
        s"n=$n est=$e relErr=${math.abs(e - n).toDouble / n} tol=$tol")
    }
  }

  test("hll: blob is a pure function of the value SET — partitioning, " +
      "duplication and merge order leave it byte-identical") {
    val vals = (1L to 5000L)
    val a = vals.toDF("v").repartition(1)
      .agg(call_function("graft_hll_agg", col("v"), lit(9)))
      .head().getAs[Array[Byte]](0)
    val b = (vals ++ vals ++ vals.reverse).toDF("v").repartition(23)
      .agg(call_function("graft_hll_agg", col("v"), lit(9)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(a, b))
  }

  test("hll: merging stored per-slice sketches equals sketching the " +
      "union, even when slices overlap") {
    val slices = Seq(
      (1L to 4000L),            // slice 0
      (3000L to 7000L),         // overlaps slice 0
      (6500L to 9000L))         // overlaps slice 1
    val perSlice = slices.zipWithIndex.map { case (r, i) =>
      r.toDF("v").withColumn("day", lit(i))
        .groupBy("day")
        .agg(call_function("graft_hll_agg", col("v"), lit(10)).as("sk"))
    }.reduce(_ union _)
    val merged = perSlice
      .agg(call_function("graft_hll_merge", col("sk")))
      .head().getAs[Array[Byte]](0)
    val direct = slices.flatten.toDF("v")
      .agg(call_function("graft_hll_agg", col("v"), lit(10)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, direct))
    // and the estimate is the union's, not the sum of slices
    val e = graft.functions.LongHll.estimate(merged)
    assert(math.abs(e - 9000L).toDouble / 9000 < 0.15, s"est=$e")
  }

  test("graft_hll_estimate participates in whole-stage codegen") {
    val blob = spark.range(1000)
      .agg(call_function("graft_hll_agg", col("id"), lit(8)))
      .head().getAs[Array[Byte]](0)
    val probed = spark.range(5)
      .select(call_function("graft_hll_estimate", lit(blob)).as("e"))
    val hasWsc = probed.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, probed.queryExecution.executedPlan.toString)
    assert(probed.collect().forall(_.getLong(0) > 800L))
  }

  test("hll: registers expose the blob exactly; nulls are skipped; " +
      "empty merge group yields null") {
    val blob = Seq(Some(5L), None, Some(9L)).toDF("v")
      .agg(call_function("graft_hll_agg", col("v"), lit(4)))
      .head().getAs[Array[Byte]](0)
    val regs = graft.functions.LongHll.registers(blob)
    assert(regs.numElements() == 16)
    assert((0 until 16).count(regs.getInt(_) > 0) == 2) // 2 distinct values
    val emptyMerge = spark.range(0)
      .select(lit(blob).as("sk"))
      .agg(call_function("graft_hll_merge", col("sk")))
      .head()
    assert(emptyMerge.isNullAt(0))
  }

  test("hll: invalid p, mixed precisions and malformed blobs fail " +
      "cleanly") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(1).agg(
        call_function("graft_hll_agg", col("id"), lit(3))).head()
    }
    val short = intercept[Exception] {
      spark.range(1).selectExpr("graft_hll_estimate(CAST('x' AS BINARY))")
        .head()
    }
    assert(short.toString.contains("graft_hll") ||
      (short.getCause != null && short.getCause.toString.contains("graft_hll")),
      s"unexpected failure shape: $short")
    val p9 = spark.range(10).agg(
      call_function("graft_hll_agg", col("id"), lit(9))).head().getAs[Array[Byte]](0)
    val p10 = spark.range(10).agg(
      call_function("graft_hll_agg", col("id"), lit(10))).head().getAs[Array[Byte]](0)
    val mixed = intercept[Exception] {
      Seq(p9, p10).toDF("sk")
        .agg(call_function("graft_hll_merge", col("sk"))).head()
    }
    assert(mixed.getMessage != null)
  }

  test("graft_cms_dot never undercounts the join size, and is exact when " +
      "the sketch is wide enough to be collision-free") {
    val left = (0L until 4000L).map(i => i % 37).toDF("k")   // 37 keys
    val right = (0L until 900L).map(i => i % 13).toDF("k")   // subset keys
    val exact = {
      val la = left.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val rb = right.groupBy("k").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      la.map { case (k, n) => n * rb.getOrElse(k, 0L) }.sum
    }
    def dotAt(width: Int): Long = {
      val a = left.agg(call_function("graft_cms_agg", col("k"), lit(4), lit(width)))
        .head().getAs[Array[Byte]](0)
      val b = right.agg(call_function("graft_cms_agg", col("k"), lit(4), lit(width)))
        .head().getAs[Array[Byte]](0)
      Seq((a, b)).toDF("a", "b")
        .selectExpr("graft_cms_dot(a, b) AS d").head().getLong(0)
    }
    assert(dotAt(4096) == exact)   // collision-free regime: exact
    assert(dotAt(16) >= exact)     // tiny sketch: overcount only
  }

  test("graft_cms_dot participates in whole-stage codegen and rejects " +
      "mismatched shapes and bad types") {
    val blob = spark.range(100).agg(
      call_function("graft_cms_agg", col("id"), lit(4), lit(64)))
      .head().getAs[Array[Byte]](0)
    // one side kept non-foldable (depends on id) so the expression runs
    // inside codegen instead of being constant-folded at plan time
    val df = spark.range(3).select(call_function("graft_cms_dot",
      when(col("id") >= 0, lit(blob)), lit(blob)).as("d"))
    val hasWsc = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    assert(df.head().getLong(0) >= 100L)
    // self-join of distinct ids in a wide sketch: exactly n
    val wide = spark.range(100).agg(
      call_function("graft_cms_agg", col("id"), lit(4), lit(4096)))
      .head().getAs[Array[Byte]](0)
    assert(Seq((wide, wide)).toDF("a", "b")
      .selectExpr("graft_cms_dot(a, b)").head().getLong(0) == 100L)
    val other = spark.range(100).agg(
      call_function("graft_cms_agg", col("id"), lit(4), lit(128)))
      .head().getAs[Array[Byte]](0)
    val e = intercept[Exception] {
      Seq((blob, other)).toDF("a", "b").selectExpr("graft_cms_dot(a, b)").head()
    }
    assert(e.getMessage.contains("shapes differ") ||
      e.getCause != null && e.getCause.getMessage.contains("shapes differ"))
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cms_dot(1L, 2L)").head()
    }
    assert(Seq((Option.empty[Array[Byte]], blob)).toDF("a", "b")
      .selectExpr("graft_cms_dot(a, b)").head().isNullAt(0))
  }

  test("graft_hilbert from SQL equals the reference walk and " +
      "participates in whole-stage codegen") {
    val df = spark.range(256)
      .selectExpr("id % 16 AS x", "id div 16 AS y")
      .selectExpr("x", "y", "graft_hilbert(x, y, 4) AS h")
    val hasWsc = df.queryExecution.executedPlan.collect {
      case w: WholeStageCodegenExec => w
    }.nonEmpty
    assert(hasWsc, df.queryExecution.executedPlan.toString)
    df.collect().foreach { r =>
      assert(r.getLong(2) ==
        graft.operators.Hilbert.index(r.getLong(0), r.getLong(1), 4))
    }
    // null coordinate propagates null
    assert(spark.sql(
      "SELECT graft_hilbert(CAST(NULL AS BIGINT), 1L, 4)").head().isNullAt(0))
  }

  test("graft_hilbert rejects bad arity, types, and bits at analysis time") {
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbert(1L, 2L)").head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbert(1L, 2L, 32)").head()
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_hilbert(1, 2L, 4)").head() // INT coordinate
    }
    intercept[org.apache.spark.sql.AnalysisException] {
      // non-literal bits
      spark.range(1).selectExpr(
        "graft_hilbert(id, id, CAST(id AS INT))").head()
    }
  }
}
