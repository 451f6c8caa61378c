package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin

/** Source/sink format round-trips and the skew-salted join. */
class FormatsAndSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("engine tables round-trip through json, csv and orc sinks/sources") {
    val src = Tables.nation(spark, "/root/testdata/sf0.001")
      .select("n_nationkey", "n_name", "n_regionkey")
    val expect = src.collect().map(_.toSeq).toSet
    Seq("json", "csv", "orc").foreach { fmt =>
      val dir = s"/tmp/graft_fmt_roundtrip/$fmt"
      src.write.format(fmt).option("header", "true").mode("overwrite").save(dir)
      val back = spark.read.format(fmt)
        .option("header", "true").option("inferSchema", "true")
        .load(dir)
        .select(col("n_nationkey").cast("long"), col("n_name"),
          col("n_regionkey").cast("long"))
      assert(back.collect().map(_.toSeq).toSet == expect, s"format $fmt")
    }
  }

  test("salted join equals the plain join on skewed data") {
    // 90% of fact rows share one hot key
    val fact = spark.range(0, 20000)
      .select(when(col("id") % 10 < 9, 7L).otherwise(col("id") % 100).as("k"),
        col("id").as("payload"))
    val dim = spark.range(0, 100).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("name"))
    val plain = fact.join(dim, "k")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    val salted = SaltedJoin.innerSalted(fact, dim, "k")
      .select("k", "payload", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
  }
}
