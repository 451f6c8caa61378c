package graft

import java.util.concurrent.ConcurrentHashMap
import scala.jdk.CollectionConverters._
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Curation

/** Skewed-layout stress for the round-7 text operators (`duplicateSpans`,
  * `epochShuffle`): the earlier scale probes amplified UNIFORM data, so a
  * hot-class layout — one document class holding half the corpus's tokens
  * and repeating the same passage — had never been exercised. Skew here
  * cannot be fixed by AQE's skew-join splitter (the hot key sits in a
  * `groupBy`, not a join), so the operators' own shapes must absorb it:
  *
  *   - `duplicateSpans`: the hot window hash (one 60-bit key carrying the
  *     whole hot class) collapses MAP-SIDE in the occurrence-count
  *     partial aggregate, the duplicate-key semi-join broadcasts its tiny
  *     right side, and the island merge partitions by doc_id — which the
  *     hot CLASS spreads across thousands of documents. No stage funnels
  *     the class through one task.
  *   - `epochShuffle`: the md5 re-key destroys any input skew by
  *     construction — shard populations stay balanced no matter how
  *     clustered the id space or the physical layout is.
  *
  * The spec pins both properties with a task-metrics listener: every
  * shuffle stage of consequence must spread its records across tasks (no
  * single task reading a straggler-class share), and the duplicate-count
  * exchange must move fewer rows than the raw shingle relation (the
  * map-side combine actually firing on the hot key). The irreducible
  * case — ONE physical document so large its island merge dominates — is
  * out of scope by design: per-document work is the operator's unit of
  * parallelism, documented in the scaladoc contract. */
class SkewStressSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Runs `body` under a listener that records, per stage, each task's
    * shuffle-read record count; returns (result, stageId -> task reads).
    * Listener delivery is async — drained with the same settle the
    * QBench spill capture uses.
    *
    * AQE partition COALESCING is disabled for the capture: at unit-test
    * scale every exchange is far below the 64 MB advisory size, so AQE
    * legitimately rightsizes it into one partition — which reads as a
    * 100%-in-one-task "straggler" while actually being small-data
    * housekeeping that cannot happen on a straggler-sized exchange. The
    * property under test is KEY balance, which coalescing obscures. */
  private def withStageReads[T](body: => T): (T, Map[Int, Seq[Long]]) = {
    val reads = new ConcurrentHashMap[Int, List[Long]]()
    val l = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null)
          reads.merge(t.stageId, List(m.shuffleReadMetrics.recordsRead),
            (a, b) => b ::: a)
      }
    }
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    spark.sparkContext.addSparkListener(l)
    try {
      val out = body
      Thread.sleep(500)
      (out, reads.asScala.toMap.map { case (k, v) => k -> v.toSeq })
    } finally {
      spark.sparkContext.removeSparkListener(l)
      prev match {
        case Some(v) => spark.conf.set(coalesceKey, v)
        case None    => spark.conf.unset(coalesceKey)
      }
    }
  }

  /** No stage with at least `floor` shuffle-read records may feed more
    * than `maxShare` of them through one task. */
  private def assertNoStraggler(reads: Map[Int, Seq[Long]], floor: Long,
                                maxShare: Double): Unit =
    for ((stage, tasks) <- reads; total = tasks.sum if total >= floor) {
      val worst = tasks.max.toDouble / total
      assert(worst <= maxShare,
        s"stage $stage: one task read ${(worst * 100).round}% of $total " +
          s"shuffle records (tasks: ${tasks.sorted.reverse.take(6)})")
    }

  // Hot class: 500 of 2000 docs share one 60-token passage (50% of all
  // tokens, every window duplicated 500x). Tail: unique 20-token docs.
  private lazy val skewedDocs: DataFrame = {
    val hot = (0 until 60).map(i => s"hot$i").mkString(" ")
    spark.range(2000).select(col("id").as("doc_id"),
      when(col("id") % 4 === 0, lit(hot))
        .otherwise(concat_ws(" ", (0 until 20).map(i =>
          concat(lit(s"t${i}d"), col("id"))): _*)).as("text"))
  }

  test("duplicateSpans absorbs a 50%-token hot class: map-side combine " +
    "collapses the hot window key, no stage funnels the class through " +
    "one task") {
    val (spans, reads) = withStageReads {
      val out = Curation.duplicateSpans(skewedDocs, w = 8, maxCount = 1)
      out.collect()
    }
    // correctness: every hot doc yields exactly one full-width span
    // (offsets [0, 60), 53 windows); tail docs are clean
    assert(spans.length === 500)
    assert(spans.forall { r =>
      r.getLong(0) % 4 == 0 && r.getLong(1) == 0L &&
        r.getLong(2) == 60L && r.getLong(3) == 53L
    })
    // raw shingle relation: 500 x 53 hot + 1500 x 13 tail = 46000 rows.
    // If the hot key reached the count-exchange uncombined, some stage
    // would read ~46000 records with the hot key's 26500 in one task.
    val raw = 500L * 53 + 1500L * 13
    val totals = reads.map { case (_, t) => t.sum }
    assert(totals.nonEmpty && totals.max < (raw * 0.8).toLong,
      s"an exchange moved ${totals.max} records — map-side combine " +
        s"did not absorb the hot window key (raw shingles: $raw)")
    assertNoStraggler(reads, floor = 2000L, maxShare = 0.6)
  }

  test("epochShuffle re-balances a clustered, skew-laid-out id space " +
    "into even shards") {
    // worst-case layout: one input partition, ids clustered in runs of
    // 1000 with huge gaps (a freshly-compacted hot shard, physically)
    val ids = spark.range(10000)
      .select((col("id") % 10 * 1000000L + col("id") / 10).as("doc_id"))
      .coalesce(1)
    val (shardCounts, reads) = withStageReads {
      Curation.epochShuffle(ids, col("doc_id"), epoch = 3, nShards = 8)
        .groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("maxp"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    }
    assert(shardCounts.length === 8)
    // pos is a contiguous 1..n permutation index within each shard
    assert(shardCounts.forall { case (_, n, maxp) => n == maxp })
    val ns = shardCounts.map(_._2)
    val mean = ns.sum.toDouble / ns.length
    assert(ns.max / mean <= 1.25 && ns.min / mean >= 0.75,
      s"md5 sharding left shards unbalanced: ${ns.sorted.toSeq}")
    assertNoStraggler(reads, floor = 2000L, maxShare = 0.6)
  }
}
