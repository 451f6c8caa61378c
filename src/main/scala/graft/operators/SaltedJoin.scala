package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-salted equi-join: when one join key carries a disproportionate
  * share of the fact rows, a plain hash join sends that key's entire
  * volume to one task. Salting splits each fact row's key into one of
  * `saltFactor` synthetic sub-keys and replicates the dimension row to all
  * sub-keys, so the hot key fans out over `saltFactor` tasks. Semantics
  * are identical to the plain inner join (each fact row still meets its
  * dimension row exactly once).
  *
  * AQE's skew-join handling covers sort-merge joins after the fact; this
  * is the explicit form for pipelines that know their hot keys up front
  * (e.g. dedup bucket joins on degenerate shingles) or run with AQE off.
  * The salt value is NOT deterministic across runs or repartitionings
  * (`monotonically_increasing_id` is only stable within one partition
  * layout) — what IS deterministic is the join *result*, because every
  * fact row meets its dimension row exactly once regardless of which salt
  * it drew. Do not reuse the salt column itself as a correctness-relevant
  * value. */
object SaltedJoin {

  def innerSalted(fact: DataFrame, dim: DataFrame, key: String,
                  saltFactor: Int = 8): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(spark_partition_id().cast("long") + monotonically_increasing_id(),
        lit(saltFactor.toLong)))
    val exploded = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    salted.join(exploded, Seq(key, "__salt")).drop("__salt")
  }

  /** Salt advisor — turns the skew diagnosis (q_skew_report's shape) into
    * the `saltFactor` inputs [[innerSalted]] needs: a key is HOT when its
    * row count exceeds one task's fair share (`n * tasks > total`), and
    * its recommended factor is the number of fair shares it occupies,
    * `ceil(n * tasks / total)` — enough sub-keys that no task carries
    * more than ~1 fair share of the hot key. Exact integer arithmetic;
    * one combine-heavy aggregate + a 1-row broadcast. Keys under the
    * threshold are absent (salt factor 1 implied). */
  def adviseSalts(fact: DataFrame, key: String, tasks: Int = 32): DataFrame = {
    require(tasks >= 1, s"tasks >= 1, got $tasks")
    val counts = fact.groupBy(key).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .where(col("n") * tasks > col("total"))
      .select(col(key), col("n"),
        expr("n * 1000000 div total").as("share_micros"),
        // true ceil via the +denominator-1 shift (positive operands, so
        // truncating `div` == floor): -((-a) div b) is NOT a ceil under
        // Spark/DuckDB truncate-toward-zero division — it collapsed to
        // floor, under-salting any key holding a fractional fair share.
        expr(s"(n * $tasks + total - 1) div total").as("salt_factor"))
  }
}
