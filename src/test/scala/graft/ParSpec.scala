package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** util.Par.widen gate: repartition only when it buys >= 4x width, and
  * never change the data. */
class ParSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("a near-serial relation widens to default parallelism") {
    val p = spark.sparkContext.defaultParallelism
    // getOrCreate may hand this suite an earlier suite's session whose
    // master ignores the local[8] above; below 4 cores the 4x gate
    // (correctly) never fires, so the widen expectation is vacuous
    assume(p >= 4, s"inherited session parallelism $p < 4")
    val df = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    val w = util.Par.widen(df)
    assert(w.rdd.getNumPartitions == p)
  }

  test("a non-scan-rooted plan passes through unprobed") {
    val df = spark.range(0, 1000, 1, numPartitions = 1).toDF("id")
    // an aggregate is not a leaf/Project/Filter chain: widen must not
    // touch it (probing .rdd would materialize the shuffle stage twice
    // under AQE)
    val agg = df.groupBy(org.apache.spark.sql.functions.expr("id % 10"))
      .count()
    assert(util.Par.widen(agg) eq agg, "aggregate-rooted plan untouched")
    val joined = df.join(spark.range(10).toDF("id"), "id")
    assert(util.Par.widen(joined) eq joined, "join-rooted plan untouched")
  }

  test("a relation within 4x of default parallelism is left alone") {
    val p = spark.sparkContext.defaultParallelism
    val n = math.max(1, p / 2) // 2x gain only — below the 4x bar
    val df = spark.range(0, 1000, 1, numPartitions = n).toDF("id")
    val w = util.Par.widen(df)
    assert(w.rdd.getNumPartitions == n, "no repartition below a 4x gain")
  }

  test("a wider-than-parallelism relation is untouched") {
    val p = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 1000, 1, numPartitions = p * 2).toDF("id")
    assert(util.Par.widen(df).rdd.getNumPartitions == p * 2)
  }

  test("widening preserves the rows exactly") {
    val df = spark.range(0, 997, 1, numPartitions = 1).toDF("id")
    val got = util.Par.widen(df).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(0L until 997L))
  }
}
