package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines.
  *
  * Sampling at 100 TB must be reproducible (re-runs, retries and backfills
  * have to pick the same rows) and coordination-free (no RNG state shared
  * across executors). Both operators therefore derive the keep/drop
  * decision from a salted 60-bit md5 of the row key — a pure narrow
  * projection, no shuffle, identical in the DuckDB oracle.
  */
object Sampling {

  /** Salted per-key sampling bucket in [0, 100). */
  def bucket(key: Column, salt: String): Column =
    pmod(Dedup.hash60(concat(lit(salt), lit(":"), key.cast("string"))), lit(100L))

  /** Keep rows whose salted key-hash bucket falls below `pct`. */
  def hashSample(df: DataFrame, key: Column, pct: Int,
                 salt: String = "graft"): DataFrame =
    df.where(bucket(key, salt) < pct)

  /** Deterministic train/val/test assignment: the salted key-hash bucket
    * lands in [0, trainPct) -> train, [trainPct, trainPct + valPct) ->
    * val, else test. Pure narrow projection — the split survives re-runs,
    * backfills and engine changes because it is a function of the key
    * alone, and changing the salt re-rolls the whole assignment (the
    * standard guard against accidental test-set reuse across
    * experiments). */
  def split3(df: DataFrame, key: Column, trainPct: Int, valPct: Int,
             salt: String = "graft-split"): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "need 0 < trainPct, 0 <= valPct, trainPct + valPct < 100")
    val b = bucket(key, salt)
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "val")
        .otherwise("test"))
  }

  /** Per-stratum rates: keep a row when its bucket is below the rate of its
    * stratum (default rate for unlisted strata). */
  def stratifiedSample(df: DataFrame, strata: Column, key: Column,
                       rates: Map[String, Int], defaultPct: Int,
                       salt: String = "graft"): DataFrame = {
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (value, pct)) =>
      when(strata === value, pct).otherwise(acc)
    }
    df.where(bucket(key, salt) < rate)
  }

  // ------------------------------------------------------- budgeted mixing

  /** Per-document mix key: (lang, mix_bucket, n_tokens). The bucket encodes
    * a quality tier (quality-passing docs fill the budget first) plus a
    * salted hash sub-bucket (uniform, deterministic within the tier). */
  private def withMixBucket(docs: DataFrame, nBuckets: Int,
                            salt: String): DataFrame = {
    val toks = TextAnalysis.tokens(col("text"))
    docs.select(col("doc_id"), col("lang"), col("text"), toks.as("toks"))
      .select(col("doc_id"), col("lang"),
        size(col("toks")).cast("long").as("n_tokens"),
        TextAnalysis.stopwordCount(col("toks"), TextAnalysis.EnStop)
          .cast("long").as("stopword_count"),
        length(regexp_replace(col("text"), "[^.,;:!?]", ""))
          .cast("long").as("punct_count"),
        length(col("text")).cast("long").as("n_chars"))
      .withColumn("quality_ok", TextAnalysis.qualityOkFromStats(col("n_tokens"),
        col("stopword_count"), col("punct_count"), col("n_chars")))
      .withColumn("mix_bucket",
        when(col("quality_ok"), lit(0L)).otherwise(lit(nBuckets.toLong)) +
          bucket2(col("doc_id"), nBuckets, salt))
  }

  private def bucket2(key: Column, n: Int, salt: String): Column =
    pmod(Dedup.hash60(concat(lit(salt), lit(":"), key.cast("string"))), lit(n.toLong))

  /** Token-budgeted corpus mixing: per language, keep documents — best
    * quality tier first, salted-hash order within a tier — until the token
    * budget is reached, cutting at *bucket* granularity.
    *
    * The bucket cut is the 100 TB design: an exact per-document cumulative
    * cut needs a per-language total order (single-task sort per language —
    * a skew bottleneck when one language dominates the corpus). Instead
    * token sums aggregate per (lang, bucket) — one narrow fact shuffle —
    * and the cumulative/threshold step runs over the tiny
    * (#langs x 2*nBuckets) relation; kept buckets broadcast back. With the
    * default 1024 sub-buckets the cut lands within ~0.1% of the budget for
    * any corpus large enough to care.
    *
    * Returns the per-(lang, bucket) decision relation
    * (lang, mix_bucket, n_docs, n_tokens, cum_tokens, kept);
    * [[budgetedMix]] applies it to the documents. */
  def budgetedMixBuckets(docs: DataFrame, tokenBudget: Long,
                         nBuckets: Int = 1024,
                         salt: String = "graft-mix"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    withMixBucket(docs, nBuckets, salt)
      .groupBy("lang", "mix_bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(
        Window.partitionBy("lang").orderBy("mix_bucket")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("kept", col("cum_tokens") <= tokenBudget)
  }

  /** The kept documents under [[budgetedMixBuckets]]'s decision (re-scans
    * the corpus once to re-derive buckets; persist the input upstream if
    * the double scan matters). */
  def budgetedMix(docs: DataFrame, tokenBudget: Long, nBuckets: Int = 1024,
                  salt: String = "graft-mix"): DataFrame = {
    val kept = budgetedMixBuckets(docs, tokenBudget, nBuckets, salt)
      .where(col("kept")).select("lang", "mix_bucket")
    withMixBucket(docs, nBuckets, salt)
      .join(broadcast(kept), Seq("lang", "mix_bucket"))
      .select("doc_id", "lang", "n_tokens", "mix_bucket")
  }

  // ---------------------------------------------------- weighted sampling

  /** Weight-proportional sample of k rows per group — Priority Sampling
    * (Duffield/Lund/Thorup): each row gets priority `u / w` for a uniform
    * u, and the k SMALLEST priorities win, so inclusion probability grows
    * with weight. u is the salted 60-bit key hash (deterministic,
    * coordination-free, same value in the oracle) and the division is
    * integer — no `ln`, no float, no RNG state. Ties (identical priority)
    * break on the key hash then the key itself, so re-runs pick the same
    * rows bit-for-bit.
    *
    * Shape: one narrow projection + one rank window per group;
    * WindowGroupLimit prunes each partition to k rows before the
    * exchange. */
  def prioritySample(df: DataFrame, groupCol: Column, key: Column,
                     weight: Column, k: Int,
                     salt: String = "graft-pri"): DataFrame = {
    require(k > 0)
    val u = Dedup.hash60(concat(lit(salt), lit(":"), key.cast("string")))
    df.withColumn("__u", u)
      .withColumn("__w", weight.cast("long"))
      // non-positive weights are excluded, not ranked: a zero weight would
      // make the integer division null, and nulls sort FIRST ascending —
      // a weightless row must never win the sample
      .where(col("__w") > 0)
      .withColumn("__pri", expr("__u div __w"))
      .withColumn("__rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
          .orderBy(col("__pri"), col("__u"), key)))
      .where(col("__rk") <= k)
      .drop("__u", "__w", "__pri", "__rk")
  }
}
