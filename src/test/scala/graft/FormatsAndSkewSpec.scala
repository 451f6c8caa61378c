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

  test("schema evolution: old and new parquet files merge; absent columns " +
      "read as null") {
    // a long-lived 100 TB table accretes columns over its lifetime; old
    // files must keep reading after the schema grows, with the added
    // column null — no rewrite of historical data
    val dir = "/tmp/graft_fmt_evolution"
    (1L to 5L).map(i => (i, s"v$i")).toDF("id", "name")
      .write.mode("overwrite").parquet(s"$dir/batch=1")
    (6L to 8L).map(i => (i, s"v$i", i * 10)).toDF("id", "name", "score")
      .write.mode("overwrite").parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.sorted.toSeq == Seq("batch", "id", "name", "score"))
    val rows = merged.collect()
      .map(r => r.getLong(0) -> Option(r.get(r.fieldIndex("score")))).toMap
    assert(rows.size == 8)
    (1L to 5L).foreach(i => assert(rows(i).isEmpty, s"old row $i"))
    (6L to 8L).foreach(i => assert(rows(i).contains(i * 10), s"new row $i"))
    // and the evolved column still admits pushdown on the new files
    val q = merged.where(col("score") > 60)
    assert(q.collect().map(_.getLong(0)).toSet == Set(7L, 8L))
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

  test("AQE skew-join stance: runtime split handles the hot SMJ partition") {
    // The engine's position (PLANS.md): prefer broadcast for dim joins;
    // when both sides must shuffle, AQE's skew-join split is the default
    // mitigation; SaltedJoin is the explicit form for known-hot keys, AQE
    // off, or skew in shapes AQE cannot rewrite (groupBy keys). This case
    // pins the AQE half on the 90%-hot-key fixture.
    val keys = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> scala.util.Try(spark.conf.get(k)).toOption)
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 10 < 9, 7L).otherwise(col("id") % 100).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      val joined = fact.join(dim, "k")
      assert(joined.collect().length == 200000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE should mark the hot partition's join as skew-handled:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE skew-join stance: with AQE off, salting is what balances partitions") {
    val saved = scala.util.Try(spark.conf.get("spark.sql.adaptive.enabled")).toOption
    val savedBc = scala.util.Try(spark.conf.get("spark.sql.autoBroadcastJoinThreshold")).toOption
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val fact = spark.range(0, 200000)
        .select(when(col("id") % 10 < 9, 7L).otherwise(col("id") % 100).as("k"),
          col("id").as("payload"))
      val dim = spark.range(0, 100).select(col("id").as("k"),
        concat(lit("dim_"), col("id")).as("name"))
      def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Int =
        df.rdd.mapPartitions(it => Iterator.single(it.size)).collect().max
      val plainMax = maxPartitionRows(fact.join(dim, "k"))
      val saltedMax = maxPartitionRows(SaltedJoin.innerSalted(fact, dim, "k"))
      // plain SMJ: the hot key's ~180k rows land in ONE task; salted: they
      // fan out over saltFactor=8 sub-keys
      assert(plainMax >= 180000, s"hot partition expected, got $plainMax")
      assert(saltedMax <= plainMax / 2,
        s"salting should halve the max partition at least: $saltedMax vs $plainMax")
    } finally {
      saved.foreach(spark.conf.set("spark.sql.adaptive.enabled", _))
      savedBc.foreach(spark.conf.set("spark.sql.autoBroadcastJoinThreshold", _))
    }
  }

  test("bucketed interval join equals the naive range join on skewed keys") {
    // one hot key with dense timestamps + sparse cold keys; pseudo-random
    // spacing so pairs fall inside bins, across bin boundaries, and out
    // of range
    val tol = 1000L
    val left = (1 to 300).map { i =>
      val k = if (i % 10 != 0) 1L else (i % 7).toLong + 2
      (k, i.toLong, (i.toLong * 337) % 20000)
    }.toDF("k", "lid", "lms")
    val right = (1 to 300).map { i =>
      val k = if (i % 9 != 0) 1L else (i % 5).toLong + 2
      (k, i.toLong + 1000, (i.toLong * 211) % 20000)
    }.toDF("k", "rid", "rms")
    val naive = left.join(right, Seq("k"))
      .where(abs(col("lms") - col("rms")) <= tol)
      .select("k", "lid", "rid").collect().map(_.toSeq).toSet
    val bucketed = graft.operators.IntervalJoin
      .within(left, right, "k", "lms", "rms", tol)
      .select("k", "lid", "rid").collect().map(_.toSeq).toSet
    assert(naive.nonEmpty)
    assert(bucketed == naive,
      s"missing=${(naive -- bucketed).size} extra=${(bucketed -- naive).size}")
  }

  test("interval join bound is inclusive and bins do not duplicate pairs") {
    val tol = 100L
    val left = Seq((1L, 10L, 1000L)).toDF("k", "lid", "lms")
    val right = Seq(
      (1L, 20L, 1100L),  // exactly +tol -> kept (inclusive)
      (1L, 21L, 1101L),  // +tol+1 -> dropped
      (1L, 22L, 900L),   // exactly -tol -> kept
      (1L, 23L, 999L),   // same bin -> kept once
      (2L, 24L, 1000L))  // other key -> dropped
      .toDF("k", "rid", "rms")
    val got = graft.operators.IntervalJoin
      .within(left, right, "k", "lms", "rms", tol)
      .collect().map(_.getAs[Long]("rid")).sorted.toSeq
    assert(got == Seq(20L, 22L, 23L)) // exactly once each
  }

  test("profile counts nulls, exact distincts and stringified min/max") {
    val df = Seq(
      (1L, Some("b"), Some(10)),
      (2L, None, Some(30)),
      (3L, Some("a"), None),
      (4L, Some("a"), Some(10))).toDF("id", "s", "v")
    val got = graft.operators.Profile.profile(df, Seq("id", "s", "v"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))
      .toMap
    assert(got("id") == (4L, 4L, 4L, "1", "4"))
    assert(got("s") == (4L, 3L, 2L, "a", "b"))   // null excluded everywhere
    assert(got("v") == (4L, 3L, 2L, "10", "30"))
    intercept[IllegalArgumentException] {
      graft.operators.Profile.profile(df, Seq("nope"))
    }
  }

  test("interval join rejects colliding non-key column names") {
    val l = Seq((1L, 1L)).toDF("k", "ms")
    val r = Seq((1L, 2L)).toDF("k", "ms")
    intercept[IllegalArgumentException] {
      graft.operators.IntervalJoin.within(l, r, "k", "ms", "ms", 10L)
    }
  }

  test("salt advisor flags only above-fair-share keys with ceil factors") {
    // 100 rows: hot key 60, warm 30, ten cold keys with 1 each
    val fact = (Seq.fill(60)("hot") ++ Seq.fill(30)("warm") ++
      (1 to 10).map(i => s"c$i")).toDF("k")
    val adv = SaltedJoin.adviseSalts(fact, "k", tasks = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    // fair share = 10 rows; hot: ceil(60*10/100) = 6; warm: 3; cold absent
    assert(adv == Map("hot" -> 6L, "warm" -> 3L))
    // boundary: exactly fair share is NOT flagged (strict >)
    val even = (1 to 10).flatMap(i => Seq.fill(10)(s"k$i")).toDF("k")
    assert(SaltedJoin.adviseSalts(even, "k", tasks = 10).count() == 0L)
    // NON-divisible share: 65 of 100 rows at 10 tasks = 6.5 fair shares
    // -> true ceil is 7. The pre-r9 -((-a) div b) spelling truncated to
    // 6, leaving one subtask above a fair share.
    val frac = (Seq.fill(65)("hot") ++ (1 to 35).map(i => s"c$i")).toDF("k")
    val fracAdv = SaltedJoin.adviseSalts(frac, "k", tasks = 10)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    assert(fracAdv == Map("hot" -> 7L))
    // advised factor neutralizes the skew: salting with it keeps results
    // equal to the plain join (semantics pin)
    val dim = Seq("hot", "warm").map(k => (k, s"d_$k")).toDF("k", "v")
    val salted = SaltedJoin.innerSalted(fact, dim, "k", saltFactor = 6)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    val plain = fact.join(dim, "k")
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.size).toMap
    assert(salted == plain)
  }
}
