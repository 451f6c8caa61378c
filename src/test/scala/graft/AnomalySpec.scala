package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Anomaly

/** Exact integer z-score flagging (operators.Anomaly). */
class AnomalySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def flag(totals: Seq[Long], sigmaX10: Int): Seq[(Long, Long)] =
    Anomaly.flagOutliers(
        totals.zipWithIndex.map { case (t, i) => ("g", i.toLong, t) }
          .toDF("grp", "bucket", "total"),
        Seq("grp"), "total", sigmaX10)
      .orderBy("bucket")
      .collect()
      .map(r => (r.getAs[Long]("bucket"), r.getAs[Long]("is_anomaly")))
      .toSeq

  test("exactly-z deviation is NOT flagged; strictly-above is") {
    // a single outlier among m-1 EQUAL values always sits at exactly
    // z = sqrt(m-1) (all variance comes from the outlier): 9x10 + one
    // spike is exactly 3.0 sd whatever the spike's size. The strict >
    // rejects the knife-edge at sigmaX10=30...
    val nine = Seq(10L, 10, 10, 10, 10, 10, 10, 10, 10, 100)
    assert(flag(nine, sigmaX10 = 30).map(_._2) == Seq.fill(10)(0L))
    // ...and one decimil looser flags exactly the spike
    assert(flag(nine, sigmaX10 = 29).map(_._2)
      == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
    // non-degenerate spread: the spike is strictly above 2 sd (z=2.979),
    // the base wiggle strictly below (max z=0.463)
    assert(flag(Seq(8, 12, 8, 12, 8, 12, 8, 12, 10, 60), sigmaX10 = 20).map(_._2)
      == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L))
  }

  test("zero-variance groups flag nothing") {
    assert(flag(Seq(7, 7, 7, 7), sigmaX10 = 0).forall(_._2 == 0L))
  }

  test("groups are independent and input columns survive") {
    // group a: the strictly-above-2sd spike from the spread fixture;
    // group b: same shape but NO spike — a's spike must not leak into
    // b's statistics (pooled stats would flag b's 12s as fine either
    // way, but a's spike would stop being an outlier: pooled sd grows)
    val a = Seq(8L, 12, 8, 12, 8, 12, 8, 12, 10, 60).zipWithIndex
      .map { case (t, i) => ("a", i.toLong, t) }
    val b = Seq(8L, 12, 8, 12, 8, 12, 8, 12, 10, 10).zipWithIndex
      .map { case (t, i) => ("b", i.toLong, t) }
    val got = Anomaly.flagOutliers(
        (a ++ b).toDF("grp", "bucket", "total"), Seq("grp"), "total",
        sigmaX10 = 20)
      .orderBy("grp", "bucket").collect()
    assert(got.map(_.getAs[Long]("is_anomaly")).toSeq
      == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 1L,
        0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L))
    // grp/bucket/total pass through untouched
    assert(got.map(_.getAs[Long]("total")).sum
      == (a ++ b).map(_._3).sum)
  }

  test("agrees with a float z-score model on random data away from the boundary") {
    val rnd = new scala.util.Random(7)
    val data = for (g <- 0 until 4; b <- 0 until 40)
      yield (s"g$g", b.toLong, (rnd.nextInt(1000) + 1).toLong * 1000003L)
    val got = Anomaly.flagOutliers(
        data.toDF("grp", "bucket", "total"), Seq("grp"), "total", 25)
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("bucket")) ->
        r.getAs[Long]("is_anomaly")).toMap
    for (g <- 0 until 4) {
      val ts = data.filter(_._1 == s"g$g").map(_._3.toDouble)
      val m = ts.length
      val mean = ts.sum / m
      val sd = math.sqrt(ts.map(t => (t - mean) * (t - mean)).sum / m)
      data.filter(_._1 == s"g$g").foreach { case (grp, b, t) =>
        val z = math.abs(t - mean) / sd
        // skip the numeric knife-edge; exact algebra decides those alone
        if (math.abs(z - 2.5) > 1e-6)
          assert(got((grp, b)) == (if (z > 2.5) 1L else 0L),
            s"$grp/$b: z=$z")
      }
    }
  }

  test("distributionDrift: baseline is zero, shifts measured, " +
      "missing buckets on either side counted in full") {
    import org.apache.spark.sql.functions.col
    // period 0 (baseline): buckets a:2, b:2 -> shares 0.5/0.5
    // period 1: a:4        -> b missing in period, a share 1.0
    //   tv = (|1e6-5e5| + |0-5e5|) div 2 = 500000
    // period 2: c:1, a:1   -> c missing at baseline
    //   tv = (|5e5-5e5| + |0-5e5| + |5e5-0|) div 2 = 500000
    // period 3: a:1, b:3   -> shares 0.25/0.75, tv = 250000
    val rows = Seq(
      (0L, "a"), (0L, "a"), (0L, "b"), (0L, "b"),
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "c"), (2L, "a"),
      (3L, "a"), (3L, "b"), (3L, "b"), (3L, "b"))
    val got = Anomaly.distributionDrift(
        rows.toDF("period", "bucket").withColumn("grp",
          org.apache.spark.sql.functions.lit("g")),
        col("grp"), col("period"), col("bucket"))
      .collect()
      .map(r => r.getAs[Long]("period") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("tv_micros"))).toMap
    assert(got == Map(
      0L -> (4L, 0L), 1L -> (4L, 500000L),
      2L -> (2L, 500000L), 3L -> (4L, 250000L)))
  }

  test("distributionDrift baseline is per group, groups independent") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("g1", 5L, "x"), ("g1", 5L, "y"), ("g1", 6L, "x"),
      ("g2", 7L, "x"), ("g2", 8L, "y"))
    val got = Anomaly.distributionDrift(
        rows.toDF("grp", "period", "bucket"),
        col("grp"), col("period"), col("bucket"))
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("period")) ->
        r.getAs[Long]("tv_micros")).toMap
    // g1 baseline = period 5 (x/y half each); period 6 all-x -> tv 0.5
    // g2 baseline = period 7 (all x); period 8 all-y -> tv 1.0
    assert(got == Map(("g1", 5L) -> 0L, ("g1", 6L) -> 500000L,
      ("g2", 7L) -> 0L, ("g2", 8L) -> 1000000L))
  }
}
