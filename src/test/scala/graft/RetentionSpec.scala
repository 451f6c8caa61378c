package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Partitioned, Retention}

/** Partition-level TTL: listing, plan, physical expiry, survivors. */
class RetentionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/tmp/graft_test_retention"

  private def freshLayout(): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val df = (0L until 3000L).map(i => (i, 100 + i % 6, s"p$i"))
      .toDF("id", "day", "payload")
    Partitioned.write(df, dir, Seq("day"))
  }

  test("listPartitions reports one row per day directory with real sizes") {
    freshLayout()
    val parts = Retention.listPartitions(spark, dir, "day")
    assert(parts.map(_._1) == (100 to 105).map(_.toString))
    assert(parts.forall(p => p._2 >= 1 && p._3 > 0))
  }

  test("expire drops exactly the below-cutoff directories and no data rows " +
      "from survivors") {
    freshLayout()
    val before = spark.read.parquet(dir).where(col("day") >= 103)
      .collect().map(_.toSeq).toSet
    val plan = Retention.expire(spark, dir, "day", "103")
    assert(plan.map(_._1) == Seq("100", "101", "102"))
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.toSeq == Seq("day=103", "day=104", "day=105"))
    // surviving rows byte-identical; expired days un-readable by design
    val after = spark.read.parquet(dir).collect().map(_.toSeq).toSet
    assert(after == before && after.nonEmpty)
    // idempotent: nothing left below the cutoff
    assert(Retention.expire(spark, dir, "day", "103").isEmpty)
  }

  test("numeric cutoffs compare numerically, not lexicographically") {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    val df = Seq((1L, 9L), (2L, 10L), (3L, 100L)).toDF("id", "day")
    Partitioned.write(df, dir, Seq("day"))
    // lexicographic would call "9" > "10" and keep day=9
    val plan = Retention.expirationPlan(spark, dir, "day", "100")
    assert(plan.map(_._1).toSet == Set("9", "10"))
  }
}
