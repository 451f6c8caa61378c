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
    * n_hits, and recall in integer micros. Both inputs are deduplicated
    * on (query_id, neighbor_id) first — a multi-band candidate list or a
    * symmetrized pair relation legitimately carries duplicate pairs, and
    * without the distinct the left join would multiply matched truth rows
    * (inflating k AND n_hits). One shuffle join + one groupBy(query_id),
    * both on query_id-aligned partitioning; cost is
    * O(|truth| + |approx|), independent of corpus size. */
  def recallAt(truth: DataFrame, approx: DataFrame): DataFrame = {
    val hits = approx
      .select(col("query_id"), col("neighbor_id")).distinct()
      .withColumn("hit", lit(1L))
    truth.select("query_id", "neighbor_id").distinct()
      .join(hits, Seq("query_id", "neighbor_id"), "left")
      .groupBy("query_id")
      .agg(count(lit(1)).as("k"),
        sum(coalesce(col("hit"), lit(0L))).as("n_hits"))
      .withColumn("recall_micros", expr("n_hits * 1000000 div k"))
  }

  /** Hard-negative mining for retrieval/embedding training: from a
    * candidate list (an ANN result — similar, so "hard") remove the known
    * positives (duplicates, labeled matches), keep each query's top
    * `k` survivors by the candidate ranking.
    *
    * `candidates` carries (query_id, neighbor_id, rank); `positives` is
    * any (query_id, neighbor_id) relation — e.g. a near-dup pair list,
    * symmetrized by the caller if it is undirected. One anti-join + one
    * rank window, both on query_id-aligned partitioning; cost tracks the
    * candidate workload, not the corpus. */
  def hardNegatives(candidates: DataFrame, positives: DataFrame,
                    k: Int): DataFrame = {
    require(k > 0)
    import org.apache.spark.sql.expressions.Window
    candidates
      .join(positives.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_anti")
      .withColumn("neg_rank", row_number().over(
          Window.partitionBy("query_id").orderBy(col("rank"), col("neighbor_id")))
        .cast("long"))
      .where(col("neg_rank") <= k)
  }
}
