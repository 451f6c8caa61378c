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
}
