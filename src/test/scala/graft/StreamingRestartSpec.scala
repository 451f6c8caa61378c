package graft

import java.nio.file.{Files, Path}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{EventSessions, StreamingDedup, StreamingDrift,
  StreamingFunnel, StreamingUpsert}
import graft.streaming.StreamingFunnel.{Completion, StepEvent}
import graft.streaming.StreamingUpsert.{Change, Update}

/** Restart-from-checkpoint equivalence: production streams do not replay
  * inside one session — they get killed and restarted, recovering state,
  * watermark, and source offsets from the checkpoint. StreamingSpec's
  * replay gates never exercise that path (a MemoryStream replay keeps the
  * state store instance alive). Here every stream runs file-source ->
  * operator -> file-sink with an explicit checkpoint, is stopped with
  * unread input still pending, and is restarted as a NEW query; the only
  * carrier of pre-restart history is the checkpoint itself. Each test's
  * final assertion is equality with the batch fold over the whole log —
  * plus a pinned cross-restart interaction (late-version suppression /
  * in-TTL duplicate suppression / a window whose rows all arrived before
  * the kill) that fails if state recovery silently came back empty.
  */
class StreamingRestartSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  /** Write one JSON-lines file into a streaming source directory. The
    * file source orders files by MODIFICATION TIME (names don't matter),
    * and same-millisecond writes tie-break arbitrarily — which reordered
    * a sentinel ahead of its data on first run and late-dropped two
    * windows — so each file gets an explicit strictly-increasing mtime. */
  private val mtimeSeq = new java.util.concurrent.atomic.AtomicLong(
    System.currentTimeMillis())
  private def addFile(dir: String, name: String, lines: Seq[String]): Unit = {
    val p = Files.write(Path.of(dir, s"$name.json"),
      (lines.mkString("\n") + "\n").getBytes("UTF-8"))
    Files.setLastModifiedTime(p,
      java.nio.file.attribute.FileTime.fromMillis(mtimeSeq.addAndGet(2000)))
  }

  private def changeJson(c: Change): String =
    s"""{"k":${c.k},"v":${c.v},"op":"${c.op}","payload":"${c.payload}"}"""

  /** file-source -> maintain -> parquet-sink query, parameterized only by
    * directories, so pre- and post-restart instances are identical. */
  private def upsertQuery(srcDir: String, outDir: String, ckDir: String,
      maxFilesPerTrigger: Int) = {
    val changes = spark.readStream
      .schema(Encoders.product[Change].schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(srcDir)
      .as[Change]
    StreamingUpsert.maintain(spark, changes)
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckDir)
      .outputMode("append")
      .start()
  }

  /** Materialize the changelog the way a downstream compactor would:
    * per key the highest-version update, dropping tombstoned keys. */
  private def materialize(outDir: String): Map[Long, String] =
    spark.read.schema(Encoders.product[Update].schema).parquet(outDir)
      .as[Update].collect()
      .groupBy(_.k).map { case (_, us) => us.maxBy(_.v) }
      .filter(_.present).map(u => u.k -> u.payload).toMap

  private def batchFold(log: Seq[Change]): Map[Long, String] = {
    val base = spark.emptyDataset[(Long, String)].toDF("k", "payload")
    graft.operators.Upsert.applyChanges(
        base, log.toDF("k", "v", "op", "payload"),
        Seq("k"), Seq("payload"), "op", "v")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
  }

  test("upsert maintenance restarted from checkpoint converges to the " +
      "batch CDC fold; recovered winners suppress post-restart stragglers") {
    val (srcDir, outDir, ckDir) = (tmp("ups_src"), tmp("ups_out"), tmp("ups_ck"))
    val rnd = new scala.util.Random(29)
    val randomLog = rnd.shuffle((0 until 200).map { v =>
      val k = rnd.nextInt(60).toLong
      if (rnd.nextInt(4) == 0) Change(k, v.toLong, "delete", "")
      else Change(k, v.toLong, "upsert", s"p$v")
    })
    // pinned cross-restart interactions (keys outside the random range):
    // the winners land strictly before the kill...
    val phase1 = randomLog.take(100) ++ Seq(
      Change(900L, 1000L, "upsert", "winner"),
      Change(901L, 1000L, "delete", ""))
    // ...and their lower-version stragglers strictly after the restart,
    // so only RECOVERED state can suppress them
    val phase2 = randomLog.drop(100) ++ Seq(
      Change(900L, 5L, "upsert", "stale"),
      Change(901L, 5L, "upsert", "resurrect-attempt"))
    val fullLog = phase1 ++ phase2

    addFile(srcDir, "b000", phase1.take(60).map(changeJson))
    addFile(srcDir, "b001", phase1.drop(60).map(changeJson))
    val q1 = upsertQuery(srcDir, outDir, ckDir, maxFilesPerTrigger = 10)
    q1.processAllAvailable()
    q1.stop(); q1.awaitTermination()

    // kill window: new data lands while no query is running
    phase2.grouped(40).zipWithIndex.foreach { case (b, i) =>
      addFile(srcDir, f"b${i + 2}%03d", b.map(changeJson))
    }
    val q2 = upsertQuery(srcDir, outDir, ckDir, maxFilesPerTrigger = 10)
    try {
      q2.processAllAvailable()
      assert(materialize(outDir) == batchFold(fullLog))
      val updates = spark.read.schema(Encoders.product[Update].schema)
        .parquet(outDir).as[Update].collect()
      // recovered state suppressed the stragglers: exactly one emission
      // for each pinned key, and the tombstone held
      assert(updates.count(_.k == 900L) == 1)
      assert(updates.filter(_.k == 900L).head.payload == "winner")
      assert(updates.count(_.k == 901L) == 1)
      assert(!updates.filter(_.k == 901L).head.present)
      // exactly-once across the restart: no (k, v) emitted twice
      assert(updates.map(u => (u.k, u.v)).distinct.length == updates.length)
    } finally q2.stop()
  }

  test("upsert maintenance killed MID-DRAIN (committed batches + pending " +
      "files) restarts exactly-once and still converges") {
    val (srcDir, outDir, ckDir) = (tmp("upsk_src"), tmp("upsk_out"), tmp("upsk_ck"))
    val rnd = new scala.util.Random(31)
    val log = (0 until 240).map { v =>
      val k = rnd.nextInt(50).toLong
      if (rnd.nextInt(4) == 0) Change(k, v.toLong, "delete", "")
      else Change(k, v.toLong, "upsert", s"p$v")
    }
    rnd.shuffle(log).grouped(20).zipWithIndex.foreach { case (b, i) =>
      addFile(srcDir, f"b$i%03d", b.map(changeJson))
    }
    // one file per trigger; kill as soon as SOME batches committed, with
    // most files still unread — the kill point is deliberately loose (any
    // point must satisfy the asserts), landing between "state recovered"
    // and "source fully drained"
    val q1 = upsertQuery(srcDir, outDir, ckDir, maxFilesPerTrigger = 1)
    val deadline = System.nanoTime() + 60L * 1000 * 1000 * 1000
    while (q1.recentProgress.count(_.numInputRows > 0) < 3 &&
        System.nanoTime() < deadline) Thread.sleep(50)
    assert(q1.recentProgress.count(_.numInputRows > 0) >= 3,
      "fixture stall: no batches committed inside 60 s")
    q1.stop(); q1.awaitTermination()

    val q2 = upsertQuery(srcDir, outDir, ckDir, maxFilesPerTrigger = 10)
    try {
      q2.processAllAvailable()
      assert(materialize(outDir) == batchFold(log))
      val updates = spark.read.schema(Encoders.product[Update].schema)
        .parquet(outDir).as[Update].collect()
      assert(updates.map(u => (u.k, u.v)).distinct.length == updates.length,
        "a replayed batch double-emitted across the kill")
    } finally q2.stop()
  }

  test("TTL dedup restarted from checkpoint keeps suppressing in-TTL " +
      "duplicates and still expires state on the recovered watermark") {
    val (srcDir, outDir, ckDir) = (tmp("ttl_src"), tmp("ttl_out"), tmp("ttl_ck"))
    def docJson(id: Long, sec: Int, text: String): String =
      s"""{"doc_id":$id,"ts_ms":${1700000000000L + sec * 1000L},"text":"$text"}"""
    def query() = {
      // ONE file per trigger: the phase-2 files stage the watermark
      // (in-TTL duplicate -> sentinel -> timeout firing -> re-admission)
      // and bundling them into one batch would collapse the staging
      val docs = spark.readStream
        .schema("doc_id LONG, ts_ms LONG, text STRING")
        .option("maxFilesPerTrigger", 1)
        .json(srcDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .select("doc_id", "ts", "text")
      StreamingDedup.firstSeenTtl(spark, docs,
          watermarkDelay = "2 seconds", ttlMs = 5000L)
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode("append")
        .start()
    }
    // phase 1: A (emitted), in-batch duplicate of A (suppressed), B
    addFile(srcDir, "b000", Seq(
      docJson(1L, 0, "alpha alpha"), docJson(2L, 1, "alpha alpha"),
      docJson(3L, 1, "beta beta")))
    val q1 = query()
    q1.processAllAvailable()
    q1.stop(); q1.awaitTermination()

    // phase 2, post-restart: duplicate of A at t=3 s (inside A's TTL:
    // only the RECOVERED fingerprint state can suppress it), then a
    // sentinel pushing the watermark past every expiry, then a fresh
    // duplicate of A in the reopened window (re-admitted by design)
    addFile(srcDir, "b001", Seq(docJson(4L, 3, "alpha alpha")))
    addFile(srcDir, "b002", Seq(docJson(5L, 20, "sentinel one")))
    addFile(srcDir, "b003", Seq(docJson(6L, 30, "sentinel two")))
    addFile(srcDir, "b004", Seq(docJson(7L, 31, "alpha alpha")))
    val q2 = query()
    try {
      q2.processAllAvailable()
      val got = spark.read
        .schema(Encoders.product[StreamingDedup.Doc].schema)
        .parquet(outDir).as[StreamingDedup.Doc].collect()
        .map(_.doc_id).toSet
      // 1 = first alpha, 3 = first beta, 5/6 = sentinels, 7 = alpha
      // re-admitted after TTL expiry; 2 and 4 suppressed (4 only if the
      // restart recovered state AND watermark)
      assert(got == Set(1L, 3L, 5L, 6L, 7L), s"emitted=$got")
    } finally q2.stop()
  }

  test("funnel restarted from checkpoint completes from recovered partial " +
      "chains and never re-emits a recovered done entity") {
    val (srcDir, outDir, ckDir) = (tmp("fun_src"), tmp("fun_out"), tmp("fun_ck"))
    def stepJson(e: Long, step: Int, ts: Long): String =
      s"""{"entity":$e,"step":$step,"ts":$ts}"""
    def query() = {
      val events = spark.readStream
        .schema(Encoders.product[StepEvent].schema)
        .option("maxFilesPerTrigger", 1)
        .json(srcDir)
        .as[StepEvent]
      StreamingFunnel.completions(events, nSteps = 3, window = Some(1000L))
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode("append")
        .start()
    }
    // phase 1: entity 10 holds a PARTIAL chain (steps 1+2 — state only,
    // nothing emitted); entity 20 completes and emits before the kill
    addFile(srcDir, "b000", Seq(
      stepJson(10L, 1, 100L), stepJson(10L, 2, 150L),
      stepJson(20L, 1, 500L), stepJson(20L, 2, 510L), stepJson(20L, 3, 520L)))
    val q1 = query()
    q1.processAllAvailable()
    q1.stop(); q1.awaitTermination()
    val preKill = spark.read.schema(Encoders.product[Completion].schema)
      .parquet(outDir).as[Completion].collect()
    assert(preKill.map(_.entity).toSet == Set(20L),
      s"fixture drift: pre-kill emissions ${preKill.toSeq}")

    // phase 2, post-restart: entity 10's step 3 — completable ONLY from
    // the recovered partial state; a replayed chain for the done entity
    // 20 (recovered done flag must suppress it); a fresh entity 30
    addFile(srcDir, "b001", Seq(
      stepJson(10L, 3, 200L),
      stepJson(20L, 2, 600L), stepJson(20L, 3, 610L),
      stepJson(30L, 1, 900L), stepJson(30L, 2, 901L), stepJson(30L, 3, 902L)))
    val q2 = query()
    try {
      q2.processAllAvailable()
      val got = spark.read.schema(Encoders.product[Completion].schema)
        .parquet(outDir).as[Completion].collect()
        .map(c => c.entity -> c.times.toList).toList
      assert(got.count(_._1 == 20L) == 1, s"done entity re-emitted: $got")
      assert(got.toMap == Map(
        10L -> List(100L, 150L, 200L),
        20L -> List(500L, 510L, 520L),
        30L -> List(900L, 901L, 902L)), s"got=$got")
    } finally q2.stop()
  }

  test("session windows restarted from checkpoint merge post-restart " +
      "events into recovered open sessions, equal to the batch operator") {
    val (srcDir, outDir, ckDir) = (tmp("ses_src"), tmp("ses_out"), tmp("ses_ck"))
    def evJson(u: Long, sec: Long, v: Double): String =
      s"""{"user_id":$u,"ts_ms":${1700000000000L + sec * 1000L},"value":$v}"""
    def query() = {
      val events = spark.readStream
        .schema("user_id LONG, ts_ms LONG, value DOUBLE")
        .option("maxFilesPerTrigger", 1)
        .json(srcDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .select("user_id", "ts", "value")
      EventSessions.sessions(events, gap = "30 seconds",
          watermarkDelay = "5 seconds")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode("append")
        .start()
    }
    // phase 1: user 1 opens a session (t=0, 10 s); with a 5 s watermark
    // delay nothing closes before the kill — the open session exists only
    // in the checkpointed state store
    addFile(srcDir, "b000", Seq(evJson(1L, 0L, 0.5), evJson(1L, 10L, 0.25)))
    val q1 = query()
    q1.processAllAvailable()
    q1.stop(); q1.awaitTermination()
    assert(spark.read.parquet(outDir).isEmpty,
      "fixture drift: a session closed before the kill defeats the test")

    // phase 2: t=20 s extends the RECOVERED open session (within the 30 s
    // gap of t=10 — lost state would start a second session instead);
    // then sentinels push the watermark past every close
    addFile(srcDir, "b001", Seq(evJson(1L, 20L, 0.25)))
    addFile(srcDir, "b002", Seq(evJson(99L, 500L, 0.0)))
    addFile(srcDir, "b003", Seq(evJson(99L, 600L, 0.0)))
    val q2 = query()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir).where(col("user_id") === 1L)
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start"),
          r.getAs[java.sql.Timestamp]("session_end"),
          r.getAs[Long]("n_events"), r.getAs[Long]("sum_value_micros")))
        .toSet
      // the batch operator over the full log is the oracle: ONE merged
      // session [0, 50s) with all three events
      val batch = EventSessions.sessions(
          Seq((1L, 0L, 0.5), (1L, 10L, 0.25), (1L, 20L, 0.25))
            .map { case (u, s, v) =>
              (u, new Timestamp(1700000000000L + s * 1000L), v) }
            .toDF("user_id", "ts", "value"),
          gap = "30 seconds")
        .collect().map(r => (r.getAs[Long]("user_id"),
          r.getAs[java.sql.Timestamp]("session_start"),
          r.getAs[java.sql.Timestamp]("session_end"),
          r.getAs[Long]("n_events"), r.getAs[Long]("sum_value_micros")))
        .toSet
      assert(got == batch, s"stream=$got batch=$batch")
      assert(got.size == 1 && got.head._4 == 3L,
        s"recovered session did not merge: $got")
    } finally q2.stop()
  }

  test("drift monitor restarted from checkpoint closes pre-kill windows " +
      "from recovered counts, equal to the batch operator") {
    import graft.operators.Anomaly
    val (srcDir, outDir, ckDir) = (tmp("drf_src"), tmp("drf_out"), tmp("drf_ck"))
    val winMs = 1000L
    val base = 10L
    val bucketOf = Map("a" -> 0L, "b" -> 1L, "c" -> 2L)
    val fixture = Seq(
      (0L, "a"), (0L, "a"), (0L, "b"), (0L, "b"),
      (1L, "a"), (1L, "a"), (1L, "a"), (1L, "a"),
      (2L, "c"), (2L, "a"),
      (3L, "a"), (3L, "b"), (3L, "b"), (3L, "b")).zipWithIndex
      .map { case ((win, b), i) =>
        ("g", (base + win) * winMs + i % 7 * 10, bucketOf(b)) }
    val batch = Anomaly.distributionDrift(
        fixture.map { case (g, ms, b) => (g, new Timestamp(ms), b) }
          .toDF("grp", "ts", "bucket")
          .withColumn("period", expr(s"unix_millis(ts) div $winMs - $base")),
        col("grp"), col("period"), col("bucket"))
      .collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("period")) ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("tv_micros"))).toMap
    val w0 = fixture.filter(_._2 < (base + 1) * winMs)
    val baseline = w0.groupBy(_._3).map { case (b, g) =>
      ("g", b) -> g.size * 1000000L / w0.size }
    def rowJson(r: (String, Long, Long)): String =
      s"""{"grp":"${r._1}","ts_ms":${r._2},"bucket":${r._3}}"""
    def query() = {
      // one file per trigger: the second sentinel's batch is where the
      // recovered-window timeouts actually fire
      val rows = spark.readStream
        .schema("grp STRING, ts_ms LONG, bucket LONG")
        .option("maxFilesPerTrigger", 1)
        .json(srcDir)
        .withColumn("ts", timestamp_millis(col("ts_ms")))
        .select("grp", "ts", "bucket")
      StreamingDrift.drift(spark, rows, baseline, winMs,
          watermarkDelay = "10 seconds")
        .writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckDir)
        .outputMode("append")
        .start()
    }
    // phase 1: windows 0 and 1 in full — with a 10 s watermark delay
    // NOTHING is emitted before the kill; their counts exist only in the
    // checkpointed state store
    addFile(srcDir, "b000",
      fixture.filter(_._2 < (base + 2) * winMs).map(rowJson))
    val q1 = query()
    q1.processAllAvailable()
    q1.stop(); q1.awaitTermination()
    assert(spark.read
      .schema(Encoders.product[StreamingDrift.DriftRow].schema)
      .parquet(outDir).isEmpty,
      "fixture drift: emission before the kill defeats the recovery test")

    // phase 2: windows 2, 3, then watermark sentinels closing everything
    addFile(srcDir, "b001",
      fixture.filter(_._2 >= (base + 2) * winMs).map(rowJson))
    addFile(srcDir, "b002", Seq(rowJson(("zz", 50 * winMs, 0L))))
    addFile(srcDir, "b003", Seq(rowJson(("zz", 60 * winMs, 0L))))
    val q2 = query()
    try {
      q2.processAllAvailable()
      val got = spark.read.parquet(outDir)
        .where(col("grp") === "g").collect()
        .map(r => (r.getAs[String]("grp"),
          r.getAs[Long]("window_start_ms") / winMs - base) ->
          (r.getAs[Long]("n_events"), r.getAs[Long]("tv_micros"))).toMap
      assert(got == batch, s"stream=$got batch=$batch")
      assert(spark.read.parquet(outDir).where(col("grp") === "g").count() == 4)
    } finally q2.stop()
  }

  test("durable streaming index maintenance: kill/restart resumes from " +
      "the persisted generation, drift retrain collapses the fold " +
      "ledger, and verdicts equal the batch chain across both restarts") {
    import graft.pipeline.Ivf
    def v(xs: Double*): Seq[Float] = xs.map(_.toFloat)
    def vecJson(id: Long, emb: Seq[Float]): String =
      s"""{"vec_id":$id,"embedding":[${emb.mkString(",")}]}"""
    val ledgerRows = Seq(
      (1L, v(1, 0, 0, 0)), (2L, v(0, 1, 0, 0)),
      (3L, v(1, 0.01, 0, 0)), (4L, v(0, 1, 0.01, 0)))
    val phase1 = Seq(
      (101L, v(1, 0, 0, 0.005)), (102L, v(0, 0, 1, 0)),
      (103L, v(0, 0, 1, 0.004)))
    val phase2 = Seq(
      (201L, v(0, 0, 1, 0.003)), (202L, v(0.5, 0.5, 0.5, 0.5)),
      (203L, v(0, 1, 0.008, 0)), (204L, v(0, 0, 0, 1)))
    val phase3 = Seq((301L, v(0, 0, 1, 0.002)))
    def ledgerDf = ledgerRows.map { case (i, e) => (i, e.toArray) }
      .toDF("vec_id", "embedding")
    def df(rows: Seq[(Long, Seq[Float])]) =
      rows.map { case (i, e) => (i, e.toArray) }.toDF("vec_id", "embedding")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getString(1), Option(r.get(2)), Option(r.get(3)))
    // the batch chain this durable stream must replay across two kills
    val idx0b = Ivf.buildIndex(ledgerDf, nCentroids = 2)
    val e1 = Ivf.indexAdmit(df(phase1), idx0b, tauPct = 95, nprobe = 2)
      .collect().map(key).toSet
    val idx1b = Ivf.maintainIndex(idx0b, df(phase1))
    val e2 = Ivf.indexAdmit(df(phase2), idx1b, tauPct = 95, nprobe = 2)
      .collect().map(key).toSet
    val idx2b = Ivf.maintainIndex(idx1b, df(phase2))
    assert(idx1b.nSinceTrain == 3L && idx2b.nSinceTrain == 0L,
      "fixture must refresh in phase 1 and retrain in phase 2")
    val e3 = Ivf.indexAdmit(df(phase3), idx2b, tauPct = 95, nprobe = 2)
      .collect().map(key).toSet
    val invSet = (i: Ivf.IvfIndex) => i.inv
      .selectExpr("centroid_id", "vec_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet

    val srcDir = tmp("vec_src"); val ckDir = tmp("vec_ck")
    val idxDir = tmp("vec_idx")
    val byBatch = new java.util.concurrent.ConcurrentHashMap[Long,
      Array[org.apache.spark.sql.Row]]()
    def mk() = new graft.streaming.StreamingVectorDedup.Maintained(spark,
      spark.readStream
        .schema("vec_id LONG, embedding ARRAY<FLOAT>")
        .option("maxFilesPerTrigger", "1")
        .json(srcDir),
      ckDir, (d, batchId) => byBatch.put(batchId, d.collect()),
      tauPct = 95, nprobe = 2, indexDir = Some(idxDir))

    // instance 1: start fresh, fold phase 1 (no retrain), KILL
    val m1 = mk()
    m1.start(Ivf.buildIndex(ledgerDf, nCentroids = 2))
    addFile(srcDir, "p1", phase1.map((vecJson _).tupled))
    m1.processAllAvailable()
    assert(m1.index.nTotal == 7L && m1.index.nSinceTrain == 3L)
    m1.stop()
    // the durable generation holds the fold: base inv + folds/<0>
    val loaded1 = Ivf.loadIndex(spark, idxDir)
    assert(loaded1.nTotal == 7L && loaded1.nSinceTrain == 3L)
    assert(invSet(loaded1) == invSet(idx1b),
      "persisted fold must equal the in-memory refresh row-for-row")
    loaded1.release()

    // instance 2: RESUME, fold phase 2 -> drift retrain fires, new
    // generation saved with an empty fold ledger; KILL again
    val m2 = mk()
    m2.resume()
    assert(m2.lastFoldedBatchId == 0L, "resume must recover the fold point")
    addFile(srcDir, "p2", phase2.map((vecJson _).tupled))
    m2.processAllAvailable()
    assert(m2.index.nTotal == 11L && m2.index.nSinceTrain == 0L,
      "mid-stream drift retrain must fire on the resumed chain")
    m2.stop()
    val loaded2 = Ivf.loadIndex(spark, idxDir)
    assert(loaded2.nSinceTrain == 0L && invSet(loaded2) == invSet(idx2b),
      "retrain must persist a collapsed fresh generation")
    loaded2.release()

    // instance 3: cold resume serves phase 3 against the retrained gen
    val m3 = mk()
    m3.resume()
    assert(m3.lastFoldedBatchId == 1L)
    addFile(srcDir, "p3", phase3.map((vecJson _).tupled))
    m3.processAllAvailable()
    m3.stop()
    import scala.jdk.CollectionConverters._
    val got = byBatch.values.asScala.flatten.map(key).toSet
    assert(got == (e1 ++ e2 ++ e3))
    assert(e3.exists(r => r._1 == 301L && r._2 == "near_dup"),
      "301 must near-dup against a vector only the folded index knows")
    idx2b.release()
  }
}
