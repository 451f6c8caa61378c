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
}
