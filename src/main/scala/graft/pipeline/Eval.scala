package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Index-quality evaluation: compare an approximate retrieval result
  * against a ground-truth result, per query.
  *
  * Ground truth is inherently expensive (brute force), so the intended use
  * is a SAMPLED query set against the production index — the recall
  * numbers drive nprobe/band tuning and regression alerts, not the serving
  * path. Both inputs are plain (query_id, neighbor_id) relations, so this
  * works for any retriever pair (brute vs IVF, IVF vs IVF-PQ, BM25 vs
  * hybrid, ...).
  */
object Eval {

  /** Per-query overlap of `approx` against `truth`: k (truth size),
    * n_hits, and recall in integer micros. One shuffle join on
    * (query_id, neighbor_id) + one groupBy(query_id) — both land on the
    * same hash partitioning of query_id, so AQE coalesces them; cost is
    * O(|truth| + |approx|), independent of corpus size. */
  def recallAt(truth: DataFrame, approx: DataFrame): DataFrame = {
    val hits = approx
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("hit"))
    truth.select("query_id", "neighbor_id")
      .join(hits, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall_micros", expr("n_hits * 1000000 div k"))
  }
}
