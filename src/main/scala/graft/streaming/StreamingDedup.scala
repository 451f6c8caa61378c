package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.GroupState

import graft.pipeline.TextAnalysis

/** Streaming exact-dedup: emit only the first document ever seen per
  * normalized-content fingerprint, across micro-batches.
  *
  * State is one boolean per fingerprint key, managed by
  * `flatMapGroupsWithState` — the streaming shape of `Dedup.exact`'s
  * keep-first window. At ingest scale the state store is partitioned by
  * fingerprint, so memory per executor is bounded by its key range.
  */
object StreamingDedup {

  final case class Doc(doc_id: Long, fingerprint: String)
  final case class TimedDoc(doc_id: Long, ts: java.sql.Timestamp, fingerprint: String)

  /** Keyed first-seen filter over a stream of (doc_id, text). */
  def firstSeen(spark: SparkSession, docs: DataFrame): Dataset[Doc] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .as[Doc]
      .groupByKey(_.fingerprint)
      .flatMapGroupsWithState[Boolean, Doc](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout()) {
        (fp: String, batch: Iterator[Doc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // first occurrence within the batch: smallest doc_id
            Iterator.single(batch.minBy(_.doc_id))
          }
      }
  }

  /** First-seen dedup with *bounded* state: each fingerprint's state expires
    * once the event-time watermark passes first-seen + `ttlMs`, so executor
    * state is proportional to the TTL window's key cardinality — not the
    * corpus lifetime, which at ingest scale grows without bound under
    * [[firstSeen]]'s `NoTimeout`. The documented trade-off: a duplicate
    * arriving after its original's state expired is re-emitted (dedup
    * becomes at-most-once *per TTL window*); downstream exact jobs can
    * finish with `Dedup.exact` over the landed window.
    *
    * `docs` must carry (doc_id, ts, text); `watermarkDelay` is the usual
    * out-of-orderness bound (e.g. "10 minutes"). */
  def firstSeenTtl(spark: SparkSession, docs: DataFrame,
                   watermarkDelay: String, ttlMs: Long): Dataset[Doc] = {
    import spark.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      .select(col("doc_id"), col("ts"),
        TextAnalysis.fingerprint(col("text")).as("fingerprint"))
      .as[TimedDoc]
      .groupByKey(_.fingerprint)
      // state = the expiry timestamp: Spark CLEARS a group's timeout on
      // every function invocation, so each duplicate arrival must re-arm
      // the original first-seen + ttl expiry or the state would silently
      // become immortal (and the dedup window would never re-open)
      .flatMapGroupsWithState[Long, Doc](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (fp: String, batch: Iterator[TimedDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else if (state.exists) {
            state.setTimeoutTimestamp(
              math.max(state.get, state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          } else {
            val first = batch.minBy(_.doc_id)
            // expire at first-seen + ttl (clamped above the current
            // watermark, which Spark requires of timeout timestamps)
            val expiry = math.max(first.ts.getTime + ttlMs,
              state.getCurrentWatermarkMs() + 1)
            state.update(expiry)
            state.setTimeoutTimestamp(expiry)
            Iterator.single(Doc(first.doc_id, fp))
          }
      }
  }
}
