package graft.util

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, SubqueryAlias}

/** Scan-width adapter for CPU-heavy narrow pipelines.
  *
  * Spark parallelizes a parquet scan by byte-range splits, but a split
  * finer than a ROW GROUP is empty — the task whose range holds the row
  * group's midpoint reads everything. A compact single-row-group file
  * (the small-sf driver tables; any dimension-sized input) therefore scans
  * as ONE real task no matter how many splits the planner cuts, and every
  * narrow consumer — tokenization, shingling, codec decode, k² pair
  * expansion — inherits that single-threaded width until its first
  * exchange (measured: the 3.4 s ngram-shingle build at sf0.1 ran on one
  * core of 32).
  *
  * `widen` repartitions such an input up to the cluster's default
  * parallelism, but ONLY when that buys at least 4x the current width:
  * the repartition costs one full pass + exchange over the bytes, so a
  * merely-2x gain measurably loses (the 100x ScaleUp copies arrive as 16
  * files on a 32-core host — widening 16 -> 32 there regressed q1_pricing
  * 13.9 -> 36.6 s and the ngram shingle build 6.7 -> 14.6 s, while the
  * genuinely-serial sf0.1 scans won 2-4x). A 100 TB corpus arrives as
  * thousands of row-group-sized splits, so production scans never pay
  * the exchange; only near-serial compact inputs do, where the moved
  * bytes are by definition small and the width gain is large.
  *
  * Meant for SCAN-ROOTED relations (scan + narrow projections / filters):
  * `df.rdd` compiles the physical plan to inspect its partition count,
  * which is free for narrow plans but would materialize (and so execute
  * TWICE) the upstream query stages under AQE if the plan contained an
  * exchange. The guard is enforced, not just documented: a plan that is
  * not a leaf/Project/Filter chain passes through untouched, so callers
  * that accept arbitrary relations at a public boundary (e.g. the dedup
  * pair builders) cannot trip double execution.
  *
  * Known limitation, accepted: the gate keys off the PLANNED split
  * count, not the real data distribution. A single-row-group file big
  * enough that the planner cuts it into > parallelism/4 byte-range
  * splits still scans as one real task (every split but one is empty)
  * yet passes the gate unwidened. The driver fixtures and any
  * well-formed production layout write many row groups per large file,
  * so the shape has not been observed; gating on row-group counts would
  * need a file-footer read per plan — not worth it until the shape is
  * real.
  */
object Par {
  private def scanRooted(plan: LogicalPlan): Boolean = plan match {
    case _: LeafNode        => true
    case p: Project         => scanRooted(p.child)
    case f: Filter          => scanRooted(f.child)
    case s: SubqueryAlias   => scanRooted(s.child)
    case _                  => false
  }

  def widen(df: DataFrame): DataFrame = {
    // .rdd is undefined for a streaming relation; micro-batch width is the
    // source's concern (maxFilesPerTrigger etc.), so pass it through
    if (df.isStreaming) return df
    // non-scan-rooted plans pass through: probing .rdd would materialize
    // their upstream stages under AQE (see scaladoc)
    if (!scanRooted(df.queryExecution.analyzed)) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions.toLong * 4 <= p) df.repartition(p) else df
  }
}
