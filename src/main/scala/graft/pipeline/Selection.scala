package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-selection operators for training-corpus construction: DSIR-style
  * importance weighting/resampling, cross-slice distribution drift, and
  * curriculum ordering.
  *
  * Everything follows the engine's exact-integer-micros discipline (no
  * float logs, no RNG) so every result is deterministic across re-runs and
  * bit-for-bit reproducible by the DuckDB oracle.
  */
object Selection {

  /** DSIR-style per-document importance weight (after Xie et al. 2023,
    * "Data Selection for Language Models via Importance Resampling"):
    * score each document by how target-like its unigrams are.
    *
    * The published estimator weights a document by the log-likelihood
    * ratio sum_w log(p_target(w) / p_raw(w)). To stay in exact integer
    * arithmetic (deterministic, oracle-checkable) this variant scores each
    * token occurrence by its smoothed *target share*
    * `(cnt_target + 1) * 1e6 div (cnt_all + 2)` — the Bayesian estimate of
    * P(occurrence came from the target slice | term) — and averages over
    * the document's tokens. Per token this is the likelihood ratio
    * p_t(w)/p_raw(w) up to the constant corpus-prior factor
    * total_raw/total_target, so document *ranking* under the arithmetic
    * mean matches ranking under the mean per-token likelihood ratio.
    *
    * Shape: explode -> groupBy(doc, term) into a compact postings
    * relation; vocabulary statistics are ONE further groupBy(term) over it
    * (the conditional target count rides the same aggregate, so target and
    * raw stats cost one shuffle, not two), and the per-doc weight is one
    * groupBy(doc) over postings join vocab. The weight
    * `sum(tf * share) div sum(tf)` over postings equals the per-occurrence
    * mean exactly. No driver-side vocabulary: the vocab side joins
    * declaratively, so Catalyst/AQE broadcasts it while it is small and
    * shuffle-joins on term once the vocabulary is cluster-scale.
    *
    * The postings relation feeds two consumers (vocab stats + the weight
    * join); this lazy entry recomputes it — ~2x the corpus tokenize.
    * [[dsirSample]] persists it across the two passes and releases it
    * deterministically; callers looping over [[dsirWeights]] itself should
    * persist `docs` upstream if the double scan matters.
    *
    * Overflow bound: `(cnt_target + 1) * 1_000_000` must fit a long, i.e.
    * a single term may occur up to ~9.2e12 times — comfortable even for
    * "the" at 100 TB (~2.5e13 tokens total, top term ~1e12).
    *
    * Documents with zero tokens have no occurrences and drop out (they
    * carry no evidence either way; a selection step should drop them
    * anyway).
    *
    * @param carry functionally doc_id-dependent columns to keep (e.g.
    *              `lang`) — grouped alongside doc_id, not re-joined.
    */
  def dsirWeights(docs: DataFrame, isTarget: Column,
                  carry: Seq[String] = Nil): DataFrame =
    weightsFromPostings(postings(docs, isTarget, carry), carry)

  /** Compact (doc_id, term, tf) postings with the doc-level target flag and
    * carry columns riding the groupBy key (functionally doc-dependent, so
    * they don't change the groups). */
  private def postings(docs: DataFrame, isTarget: Column,
                       carry: Seq[String]): DataFrame =
    docs
      .select(col("doc_id") +: isTarget.as("is_target") +:
        (carry.map(col) :+ col("text")): _*)
      .withColumn("term", explode(TextAnalysis.tokens(col("text"))))
      .drop("text")
      .groupBy(col("doc_id") +: col("is_target") +: col("term") +:
        carry.map(col): _*)
      .agg(count(lit(1)).as("tf"))

  private def weightsFromPostings(post: DataFrame,
                                  carry: Seq[String]): DataFrame = {
    val vocab = post.groupBy("term").agg(
      sum(col("tf")).as("cnt_all"),
      sum(when(col("is_target"), col("tf")).otherwise(0L)).as("cnt_target"))
      .select(col("term"),
        expr("(cnt_target + 1) * 1000000 div (cnt_all + 2)").as("share_micros"))
    post.join(vocab, "term")
      .groupBy(col("doc_id") +: carry.map(col): _*)
      .agg(sum(col("tf")).as("n_tokens"),
        expr("sum(tf * share_micros) div sum(tf)").as("weight_micros"))
  }

  /** Importance resampling: k docs per group, inclusion probability
    * proportional to the DSIR weight, via the existing priority sampler
    * (salted-hash priorities — deterministic, coordination-free;
    * WindowGroupLimit prunes per-partition before the exchange).
    *
    * The postings relation is persisted across its two consumers (vocab
    * statistics, weight join) and released once the |groups| * k sample is
    * materialized — the corpus is tokenized exactly once. */
  def dsirSample(docs: DataFrame, isTarget: Column, group: String, k: Int,
                 salt: String = "graft-pri"): DataFrame = {
    val post = postings(docs, isTarget, Seq(group)).persist()
    val out = Sampling.prioritySample(
        weightsFromPostings(post, Seq(group)),
        col(group), col("doc_id"), col("weight_micros"), k, salt)
      .localCheckpoint(true)
    post.unpersist()
    out
  }

  /** Per-term distribution drift between two corpus slices — the
    * monitoring primitive for corpus-composition shift (new crawl vs old,
    * pre- vs post-filter). Reports the topK terms by absolute difference
    * of per-mille^3 (micros) unigram shares: the per-term contribution to
    * total-variation distance between the two unigram distributions.
    *
    * Shape: rows tagged into slices (a row may be in both), ONE
    * groupBy(term) carrying both conditional counts, totals as a 1-row
    * broadcast, global top-k via TakeOrderedAndProject (never a full
    * sort). The per-term stats relation feeds two consumers (totals + the
    * share projection); it is persisted across them — compact
    * (term, long, long) rows, far smaller than the corpus — and released
    * once the topK rows are materialized, so the corpus is tokenized
    * exactly once. */
  def corpusDrift(docs: DataFrame, inA: Column, inB: Column,
                  topK: Int = 25): DataFrame = {
    val toks = docs
      .select(inA.as("in_a"), inB.as("in_b"), col("text"))
      .where(col("in_a") || col("in_b"))
      .select(col("in_a"), col("in_b"),
        explode(TextAnalysis.tokens(col("text"))).as("term"))
    val stats = toks.groupBy("term").agg(
      sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
      sum(when(col("in_b"), 1L).otherwise(0L)).as("cnt_b"))
      .persist()
    val totals = stats.agg(
      sum("cnt_a").as("tot_a"), sum("cnt_b").as("tot_b"))
    // an EMPTY comparison side (tot = 0) has no mass: its shares are 0
    // by convention, so drift degenerates to the other side's share
    // instead of dividing by zero (the n=1-corpus edge)
    val out = stats.crossJoin(broadcast(totals))
      .select(col("term"), col("cnt_a"), col("cnt_b"),
        expr("CASE WHEN tot_a = 0 THEN 0L " +
          "ELSE cnt_a * 1000000 div tot_a END").as("share_a_micros"),
        expr("CASE WHEN tot_b = 0 THEN 0L " +
          "ELSE cnt_b * 1000000 div tot_b END").as("share_b_micros"))
      .withColumn("drift_micros",
        abs(col("share_a_micros") - col("share_b_micros")))
      .orderBy(col("drift_micros").desc, col("term"))
      .limit(topK)
      .localCheckpoint(true)
    stats.unpersist()
    out
  }

  /** Curriculum interleave: a deterministic total training order that (a)
    * presents higher-quality documents earlier within each stratum and (b)
    * round-robins across strata so no stratum dominates any prefix of the
    * epoch.
    *
    * `interleave_key = (pos_in_stratum - 1) * nStrata + stratum_idx` is a
    * SPARSE total order (gaps where strata differ in size) — sparseness is
    * the scale design: assigning *dense* global positions needs a global
    * total order (single-task bottleneck), while the sparse key needs only
    * ONE per-stratum rank window. Consumers sort shards by the key; gaps
    * are harmless.
    *
    * @param stratumIdx integer stratum index in [0, nStrata)
    * @param quality    higher = earlier within the stratum; ties break on
    *                   doc_id so re-runs are bit-stable
    */
  def curriculumInterleave(docs: DataFrame, stratumIdx: Column,
                           nStrata: Int, quality: Column): DataFrame = {
    require(nStrata > 0)
    docs
      .withColumn("stratum_idx", stratumIdx.cast("long"))
      .withColumn("quality_micros", quality.cast("long"))
      .withColumn("pos_in_stratum", row_number().over(
          Window.partitionBy("stratum_idx")
            .orderBy(col("quality_micros").desc, col("doc_id")))
        .cast("long"))
      .withColumn("interleave_key",
        (col("pos_in_stratum") - 1) * nStrata + col("stratum_idx"))
  }
}
