package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Bucketed

/** Bucketed-table layout: the join and the bucket-key aggregation must be
  * exchange-free, and results must equal the unbucketed forms. */
class BucketedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/tmp/graft_test_bucketed"

  private def hashExchanges(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).size

  private lazy val tables: Unit = {
    val left = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "a")
    val right = (1L to 3000L).map(i => (i % 500 + 1, i)).toDF("j", "b")
    Bucketed.writeBucketed(spark, left, "bkt_left", s"$dir/left", "k", 4)
    Bucketed.writeBucketed(spark, right, "bkt_right", s"$dir/right", "j", 4)
  }

  private def withoutBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("matching-bucket join plans zero hash exchanges") {
    tables
    withoutBroadcast {
      val joined = Bucketed.colocatedJoin(spark, "bkt_left", "bkt_right", "k", "j")
      val plan = joined.queryExecution.executedPlan.toString
      assert(hashExchanges(plan) == 0, plan)
      assert(joined.count() == 3000L) // every right key exists on the left
    }
  }

  test("bucket-key aggregation after the join stays exchange-free") {
    tables
    withoutBroadcast {
      val agg = Bucketed.colocatedJoin(spark, "bkt_left", "bkt_right", "k", "j")
        .groupBy("k").count()
      val plan = agg.queryExecution.executedPlan.toString
      assert(hashExchanges(plan) == 0, plan)
    }
  }

  test("bucketed join result equals the plain-join result") {
    tables
    val bucketed = Bucketed.colocatedJoin(spark, "bkt_left", "bkt_right", "k", "j")
      .select("k", "a", "b").collect().map(_.toSeq).toSet
    val left = (1L to 1000L).map(k => (k, k % 7)).toDF("k", "a")
    val right = (1L to 3000L).map(i => (i % 500 + 1, i)).toDF("j", "b")
    val plain = left.join(right, $"k" === $"j")
      .select("k", "a", "b").collect().map(_.toSeq).toSet
    assert(bucketed == plain)
  }

  test("each bucket lands in exactly one file") {
    tables
    val files = new java.io.File(s"$dir/left").listFiles()
      .filter(f => f.getName.startsWith("part-"))
    assert(files.length == 4, files.map(_.getName).mkString(", "))
  }
}
