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
}
