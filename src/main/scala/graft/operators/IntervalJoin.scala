package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketed interval (band) join: pairs of rows sharing a key whose
  * timestamps differ by at most `tolMs`.
  *
  * The naive formulation — equi-join on the key plus a `|Δt| <= tol`
  * residual predicate — is a per-key cross product with a late filter:
  * fine at 150 users, quadratic death on the one power-law key a real
  * event log always has. This operator quantizes both sides into
  * tol-sized bins and equi-joins on `(key, bin)`, with the right side
  * replicated into its two neighbor bins: any pair within `tol` spans at
  * most adjacent bins, so co-location is complete (no false negatives)
  * and the residual filter only prunes the bounded 3-bin neighborhood.
  * Join fan-out is local temporal density x 3 — independent of key
  * cardinality — and the plan is a standard hash-partitioned equi-join
  * that AQE can re-plan (broadcast / skew-split) like any other.
  *
  * Contract: `leftTsMs`/`rightTsMs` are non-negative epoch millis (bin
  * arithmetic uses truncating `div`, which equals floor for non-negative
  * input — the DuckDB oracle's rule too); both frames must share ONLY the
  * `key` column name. Inclusive bound: `|Δt| <= tolMs`.
  */
object IntervalJoin {

  def within(left: DataFrame, right: DataFrame, key: String,
             leftTsMs: String, rightTsMs: String, tolMs: Long): DataFrame = {
    require(tolMs > 0, s"tolMs must be positive, got $tolMs")
    val overlap = (left.columns.toSet & right.columns.toSet) - key
    require(overlap.isEmpty,
      s"left and right may only share the key column '$key'; also shared: " +
        overlap.mkString(", "))
    val lb = left.withColumn("__bin", expr(s"$leftTsMs div $tolMs"))
    val rb = right.withColumn("__bin",
      explode(array((-1 to 1).map(d => expr(s"$rightTsMs div $tolMs") + d): _*)))
    lb.join(rb, Seq(key, "__bin"))
      .where(abs(col(leftTsMs) - col(rightTsMs)) <= tolMs)
      .drop("__bin")
  }
}
