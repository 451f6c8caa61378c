package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Quantiles

/** Sketch-merge quantiles: exactness contract at accuracy > n, agreement
  * with the exact rank-statistic form, and the scale-shape plan pins that
  * justify the operator's existence (no per-group global sort). */
class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** 2 groups x 30k rows with a skewed long-tail distribution — the
    * few-groups shape the operator exists for. Deterministic LCG values. */
  private def fixture = spark.range(0, 60000).selectExpr(
    "CASE WHEN id % 2 = 0 THEN 'a' ELSE 'b' END AS g",
    "id AS row_id",
    // skewed: mostly small, occasional large spikes
    "CAST((1103515245 * id + 12345) % 997 AS DOUBLE) " +
      "+ CASE WHEN id % 101 = 0 THEN 5000.0 ELSE 0.0 END AS v")

  test("accuracy > n: sketched quartiles equal exact rank statistics") {
    val df = fixture.cache()
    val approx = Quantiles.approxQuantiles(df, Seq("g"), "v",
        Seq(0.25, 0.5, 0.75), accuracy = 1 << 20)
      .orderBy("g").collect()
    val exact = df
      .withColumn("rk", row_number().over(Window.partitionBy("g").orderBy(col("v"), col("row_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("g", "n")
      .agg(
        max(when(col("rk") === expr("cast(ceil(0.25 * n) as bigint)"), col("v"))).as("q1"),
        max(when(col("rk") === expr("cast(ceil(0.50 * n) as bigint)"), col("v"))).as("q2"),
        max(when(col("rk") === expr("cast(ceil(0.75 * n) as bigint)"), col("v"))).as("q3"))
      .orderBy("g").collect()
    approx.zip(exact).foreach { case (a, e) =>
      assert(a.getAs[String]("g") == e.getAs[String]("g"))
      assert(a.getAs[Long]("n") == e.getAs[Long]("n"))
      assert(a.getAs[Double]("q_0") == e.getAs[Double]("q1"), "q1")
      assert(a.getAs[Double]("q_1") == e.getAs[Double]("q2"), "q2")
      assert(a.getAs[Double]("q_2") == e.getAs[Double]("q3"), "q3")
    }
    df.unpersist()
  }

  test("iqrOutliers matches the exact-fence computation row-for-row") {
    val df = fixture.cache()
    val approx = Quantiles.iqrOutliers(df, Seq("g"), "v", accuracy = 1 << 20)
      .select("row_id").as[Long].collect().sorted
    val fences = df
      .withColumn("rk", row_number().over(Window.partitionBy("g").orderBy(col("v"), col("row_id"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
      .groupBy("g")
      .agg(
        max(when(col("rk") === expr("(n + 3) div 4"), col("v"))).as("q1"),
        max(when(col("rk") === expr("(3 * n + 3) div 4"), col("v"))).as("q3"))
      .withColumn("hi", col("q3") + lit(1.5) * (col("q3") - col("q1")))
    val exact = df.join(broadcast(fences.select("g", "hi")), "g")
      .where(col("v") > col("hi"))
      .select("row_id").as[Long].collect().sorted
    assert(approx.nonEmpty, "fixture should produce outliers")
    assert(approx.toSeq == exact.toSeq)
    df.unpersist()
  }

  test("registered approx doc-length quantiles equal the exact query (sf0.001)") {
    val dir = "/root/testdata/sf0.001"
    val exact = SparkEntry.queries("q_doc_length_quantiles")(spark, dir).collect()
    val approx = SparkEntry.queries("q_doc_length_quantiles_approx")(spark, dir).collect()
    assert(exact.nonEmpty, "fixture should have documents")
    assert(approx.map(_.toSeq).toSeq == exact.map(_.toSeq).toSeq)
  }

  test("bounded-accuracy sketch satisfies the GK rank contract (accuracy=200)") {
    val df = fixture.cache()
    val out = Quantiles.boundedQuantileCheck(df, Seq("g"), "v",
        Seq(0.25, 0.5, 0.75, 0.9), accuracy = 200)
      .orderBy("g", "p_micros").collect()
    assert(out.length == 8) // 2 groups x 4 percentiles
    out.foreach { r =>
      assert(r.getAs[Long]("n") == 30000L)
      assert(r.getAs[Long]("tol") == 151L) // 30000 div 200 + 1
      assert(r.getAs[Boolean]("ok"),
        s"contract broken at ${r.getAs[String]("g")}/${r.getAs[Long]("p_micros")}")
    }
    df.unpersist()
  }

  test("rankContractCheck flips ok on an out-of-tolerance claim") {
    val df = fixture.cache()
    // poisoned median claim for group a: a value above the entire corpus;
    // honest median claim for group b (true rank-15000 value)
    val trueMedianB = df.where(col("g") === "b")
      .withColumn("rk", row_number().over(Window.partitionBy("g").orderBy(col("v"), col("row_id"))))
      .where(col("rk") === 15000).select("v").as[Double].head()
    val claims = Seq(("a", 500000L, 999999.0), ("b", 500000L, trueMedianB))
      .toDF("g", "p_micros", "claimed")
    val out = Quantiles.rankContractCheck(df, claims, Seq("g"), "v", accuracy = 200)
      .orderBy("g").collect()
    assert(!out(0).getAs[Boolean]("ok"), "poisoned claim must fail the gate")
    assert(out(1).getAs[Boolean]("ok"), "true rank statistic must pass")
    df.unpersist()
  }

  test("rank contract holds across seeded corpora, accuracies, and tie density") {
    // tie-heavy distributions are the GK edge: many equal values make the
    // claimed value's rank an INTERVAL, which is exactly what the check's
    // [below+1, at_or_below] arithmetic must handle
    for (seed <- 1 to 5; accuracy <- Seq(50, 500)) {
      val mod = Seq(7, 997, 13, 31, 211)(seed - 1) // tie density per seed
      val df = spark.range(0, 2000L + 1200L * seed).selectExpr(
        s"CAST(id % ${1 + seed} AS STRING) AS g",
        s"CAST((1103515245 * (id + $seed) + 12345) % $mod AS DOUBLE) AS v")
      val bad = Quantiles.boundedQuantileCheck(df, Seq("g"), "v",
          Seq(0.1, 0.25, 0.5, 0.75, 0.9, 1.0), accuracy)
        .where(!col("ok")).count()
      assert(bad == 0L, s"seed=$seed accuracy=$accuracy mod=$mod: $bad broken claims")
    }
  }

  test("exactRankStatistics equals the window-sort reference across " +
      "partition counts, tie densities, and group shapes") {
    // include mod=7 (massive ties: boundary-straddling equal values) and a
    // 1-group frame (both quartile targets can land in one cell)
    for ((groups, mod, parts) <- Seq((1, 7, 3), (3, 31, 8), (5, 997, 64),
        (2, 13, 1))) {
      val df = spark.range(0, 4000 * groups).selectExpr(
        s"CAST(id % $groups AS STRING) AS g",
        s"CAST((1103515245 * id + 12345) % $mod AS DOUBLE) AS v")
      val got = Quantiles.exactRankStatistics(df, Seq("g"), "v",
          Seq("q1" -> ((n: Long) => (n + 3) / 4),
            "q3" -> ((n: Long) => (3 * n + 3) / 4),
            "min" -> ((_: Long) => 1L),
            "max" -> ((n: Long) => n)),
          partitions = parts)
        .orderBy("g").collect()
        .map(r => (r.getAs[String]("g"), r.getAs[Long]("n"),
          r.getAs[Double]("q1"), r.getAs[Double]("q3"),
          r.getAs[Double]("min"), r.getAs[Double]("max")))
      val ref = df
        .withColumn("rk",
          row_number().over(Window.partitionBy("g").orderBy("v")))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("g")))
        .groupBy("g", "n").agg(
          max(when(col("rk") === expr("(n + 3) div 4"), col("v"))).as("q1"),
          max(when(col("rk") === expr("(3 * n + 3) div 4"), col("v"))).as("q3"),
          max(when(col("rk") === 1L, col("v"))).as("mn"),
          max(when(col("rk") === col("n"), col("v"))).as("mx"))
        .orderBy("g").collect()
        .map(r => (r.getAs[String]("g"), r.getAs[Long]("n"),
          r.getAs[Double]("q1"), r.getAs[Double]("q3"),
          r.getAs[Double]("mn"), r.getAs[Double]("mx")))
      assert(got.toSeq == ref.toSeq, s"groups=$groups mod=$mod parts=$parts")
    }
  }

  test("exactRankStatistics: single-row group and null values excluded") {
    val df = Seq(("a", Some(5.0)), ("a", None), ("b", Some(1.0)),
      ("b", Some(2.0)), ("b", None), ("b", Some(3.0)))
      .toDF("g", "v")
    val got = Quantiles.exactRankStatistics(df, Seq("g"), "v",
        Seq("med" -> ((n: Long) => (n + 1) / 2)), partitions = 4)
      .orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // nulls are outside the rank domain: a=1 non-null row, b=3
    assert(got.toSeq == Seq(("a", 1L, 5.0), ("b", 3L, 2.0)))
  }

  test("plan shape: sketch aggregate, no window sort, broadcast fence join") {
    val plan = Quantiles.iqrOutliers(fixture, Seq("g"), "v", accuracy = 4096)
      .queryExecution.executedPlan.toString
    assert(plan.contains("percentile_approx"), "sketch aggregate expected")
    assert(!plan.contains("Window"), "no per-group rank window at any scale")
    // partial (map-side) sketch merge: two aggregate stages around one exchange
    assert("ObjectHashAggregate".r.findAllIn(plan).size >= 2,
      "partial + final sketch aggregation expected")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "fence relation should broadcast")
  }
}
