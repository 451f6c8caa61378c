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
}
