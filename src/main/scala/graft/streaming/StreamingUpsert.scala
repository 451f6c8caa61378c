package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming snapshot maintenance: the streaming twin of
  * `operators.Upsert.applyChanges` — a keyed table materialized from a
  * live change stream (the KTable / changelog-compaction shape).
  *
  * Each key's state is its current WINNER `(version, op, payload)`;
  * an arriving change only advances the state (and emits an update) if
  * its version exceeds the winner's — so changes may arrive out of order
  * ACROSS micro-batches and the materialized snapshot still converges to
  * exactly `Upsert.applyChanges` over the whole log (replay-equivalence
  * gated in StreamingSpec for arbitrary splits and shuffles of the
  * batch). A late lower-version change emits nothing; a tombstone emits
  * `present = false`, which a downstream materializer compacts to a
  * delete — the same contract as a compacted changelog topic.
  *
  * Scale shape: state is one winner per LIVE key, partitioned by key
  * across the state store — memory tracks the keyspace, not the stream;
  * per-batch work is one shuffle of the delta on the key, the same
  * exchange the batch fold pays. Versions must be unique per key (the
  * [[graft.operators.Upsert]] tie contract); equal versions keep the
  * incumbent, so replaying a batch is a no-op (idempotent ingest).
  */
object StreamingUpsert {

  /** One change: `op` is "upsert" | "delete" (anything else is ignored);
    * `payload` is the row's serialized state (opaque to the operator). */
  final case class Change(k: Long, v: Long, op: String, payload: String)

  /** Per-key state: the current winning change (encoder-visible). */
  final case class Winner(v: Long, op: String, payload: String)

  /** Changelog row: the key's new current state. `present = false` means
    * the key is deleted as of version `v`. */
  final case class Update(k: Long, v: Long, present: Boolean, payload: String)

  /** Maintain the snapshot over a stream of [[Change]]s; emits one
    * [[Update]] per key per micro-batch in which its winner advanced. */
  def maintain(spark: SparkSession, changes: Dataset[Change]): Dataset[Update] = {
    import spark.implicits._
    changes
      .groupByKey(_.k)
      .flatMapGroupsWithState[Winner, Update](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (k: Long, batch: Iterator[Change], state: GroupState[Winner]) =>
          val valid = batch.filter(c => c.op == "upsert" || c.op == "delete")
          val best = valid.foldLeft(Option.empty[Change]) { (acc, c) =>
            if (acc.forall(_.v < c.v)) Some(c) else acc
          }
          best match {
            case Some(b) if state.getOption.forall(_.v < b.v) =>
              state.update(Winner(b.v, b.op, b.payload))
              Iterator.single(Update(k, b.v, b.op != "delete",
                if (b.op == "delete") "" else b.payload))
            case _ => Iterator.empty
          }
      }
  }
}
