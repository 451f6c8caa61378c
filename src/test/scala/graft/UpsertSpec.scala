package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Upsert

/** CDC apply: last-writer-wins fold of a versioned change batch onto a
  * snapshot — per-key winner semantics, tombstone idempotence, the
  * replay/composition property, and the delta-only-window plan shape. */
class UpsertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap(rows: (Long, String, Long)*) =
    rows.toDF("k", "name", "bal")

  private def batch(rows: (Long, String, Long, String, Long)*) =
    rows.toDF("k", "name", "bal", "op", "v")

  private def apply1(base: org.apache.spark.sql.DataFrame,
                     ch: org.apache.spark.sql.DataFrame) =
    Upsert.applyChanges(base, ch, Seq("k"), Seq("name", "bal"), "op", "v")

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap

  test("winner semantics: LWW upsert, delete, resurrect, insert, carryover") {
    val base = snap((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L), (4L, "d", 40L))
    val ch = batch(
      (1L, "a1", 11L, "upsert", 1L),  // plain update
      (2L, "x", 0L, "delete", 1L),    // takedown
      (3L, "c1", 31L, "upsert", 1L),  // ...then deleted at v2
      (3L, "x", 0L, "delete", 2L),
      (4L, "x", 0L, "delete", 1L),    // ...then resurrected at v2
      (4L, "d2", 42L, "upsert", 2L),
      (5L, "e", 50L, "upsert", 1L),   // insert of a new key
      (6L, "x", 0L, "delete", 1L))    // tombstone for an absent key: no-op
    val out = asMap(apply1(base, ch))
    assert(out == Map(
      1L -> (("a1", 11L)),
      4L -> (("d2", 42L)),
      5L -> (("e", 50L))))
  }

  test("unknown ops are ignored, not applied") {
    val base = snap((1L, "a", 10L))
    val ch = batch((1L, "z", 99L, "noop", 5L))
    assert(asMap(apply1(base, ch)) == Map(1L -> (("a", 10L))))
  }

  test("idempotence and replay composition on a seeded random history") {
    val rnd = new scala.util.Random(7)
    val base = snap((0L until 200L).map(k => (k, s"n$k", k * 10)): _*)
    // 300 changes over keys 0..249 with globally unique versions
    val all = (0 until 300).map { v =>
      val k = rnd.nextInt(250).toLong
      if (rnd.nextInt(4) == 0) (k, "x", 0L, "delete", v.toLong)
      else (k, s"u$v", v.toLong * 100, "upsert", v.toLong)
    }
    val (b1, b2) = all.splitAt(150)
    val once = asMap(apply1(base, batch(all: _*)))
    val twice = asMap(apply1(apply1(base, batch(b1: _*)), batch(b2: _*)))
    val replayed = asMap(apply1(apply1(base, batch(all: _*)), batch(all: _*)))
    assert(once == twice, "sequential application must equal the concatenation")
    assert(once == replayed, "re-applying the same batch must be a no-op")
    // driver-side model
    val model = collection.mutable.Map(base.collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))): _*)
    all.groupBy(_._1).foreach { case (k, chs) =>
      val (_, name, bal, op, _) = chs.maxBy(_._5)
      if (op == "delete") model.remove(k) else model(k) = (name, bal)
    }
    assert(once == model.toMap)
  }

  test("bucketed base folds without shuffling the snapshot side") {
    import graft.sources.Bucketed
    val dir = "/tmp/graft_test_upsert_bucketed"
    val base = snap((1L to 1000L).map(k => (k, s"n$k", k * 10)): _*)
    Bucketed.writeBucketed(spark, base, "ups_base", dir, "k", 4)
    val ch = batch((1L to 200L).map(k =>
      if (k % 3 == 0) (k, "x", 0L, "delete", k)
      else (k, s"u$k", k * 100, "upsert", k)): _*)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def exchanges(df: org.apache.spark.sql.DataFrame): Int =
        "Exchange hashpartitioning".r
          .findAllIn(df.queryExecution.executedPlan.toString).size
      val bucketed = apply1(spark.table("ups_base"), ch)
      val plain = apply1(base, ch)
      // the delta side still shuffles (winner window + join alignment);
      // the snapshot side must ride its stored bucketing
      assert(exchanges(bucketed) < exchanges(plain),
        "bucketed base must remove the snapshot-side exchange")
      assert(asMap(bucketed) == asMap(plain))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("algebra closes: applyChanges(v1, changeSet(v1, v2)) == v2") {
    import graft.operators.Diff
    val rnd = new scala.util.Random(3)
    val v1 = snap((0L until 300L).map(k => (k, s"n$k", k)): _*)
    // v2: ~1/5 of keys dropped, ~1/4 mutated, 60 fresh keys appended
    val v2 = snap(((0L until 300L).flatMap { k =>
      if (rnd.nextInt(5) == 0) None
      else if (rnd.nextInt(4) == 0) Some((k, s"m$k", k + 1000))
      else Some((k, s"n$k", k))
    } ++ (1000L until 1060L).map(k => (k, s"f$k", k))): _*)
    val ch = Diff.changeSet(v1, v2, Seq("k"))
    val rebuilt = Upsert.applyChanges(v1, ch, Seq("k"), Seq("name", "bal"), "op", "v")
    assert(asMap(rebuilt) == asMap(v2))
    // a change set between identical snapshots is empty (no-op delta)
    assert(Diff.changeSet(v2, v2, Seq("k")).isEmpty)
    // and the delta is minimal: one row per differing key, no unchanged keys
    val labels = Diff.diff(v1, v2, Seq("k")).count()
    assert(ch.count() == labels)
  }

  test("plan shape: the window runs over the delta only; one full-outer fold") {
    val base = snap((1L, "a", 10L))
    val ch = batch((1L, "a1", 11L, "upsert", 1L))
    val plan = apply1(base, ch).queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), "fold must be a single full-outer join")
    assert("Window".r.findAllIn(plan).size == 1,
      "exactly one window (winner selection over the change batch)")
  }
}
