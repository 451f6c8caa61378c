package graft.util

import org.apache.spark.sql.DataFrame

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
  * Call this only on SCAN-ROOTED relations (scan + narrow projections /
  * filters): `df.rdd` compiles the physical plan to inspect its partition
  * count, which is free for narrow plans but would materialize query
  * stages under AQE if the plan contained an exchange.
  */
object Par {
  def widen(df: DataFrame): DataFrame = {
    // .rdd is undefined for a streaming relation; micro-batch width is the
    // source's concern (maxFilesPerTrigger etc.), so pass it through
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions.toLong * 4 <= p) df.repartition(p) else df
  }
}
