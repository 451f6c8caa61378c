package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dominant spectral direction of the embedding corpus — the scalable
  * PCA shape: ONE distributed pass accumulates the d x d second-moment
  * (Gram) matrix `M = sum_x x xT`, and the eigen-iteration then runs on
  * that METADATA-SIZED matrix, never touching the corpus again (the
  * `RowMatrix.computePrincipalComponents` architecture: distribute the
  * Gram accumulation, solve the tiny dense problem centrally).
  *
  * Everything is exact fixed-point integer arithmetic so the DuckDB
  * oracle replays it bit-for-bit: embeddings quantize to micros
  * (`floor(double(v) * 1e6)`, the corpus-wide convention), M entries are
  * exact integer sums of micros products, and each power-iteration step
  * `v <- M v` renormalizes to max-abs 1e6 with TRUNCATING division
  * toward zero — Scala BigInt `/` and DuckDB's integer `//` share that
  * convention (verified: `-7000000 // 3 = -2333333` in DuckDB 1.x), so
  * negative iterate components replay bit-for-bit with no emulation.
  * Power iteration from the all-ones vector is deterministic —
  * no RNG, no eigensolver library, no float drift.
  *
  * Scale shape: the corpus pass is a zero-shuffle mapPartitions fold
  * into a per-partition `d*d` long array (products bounded by 1e12, so
  * a partition would need ~9e6 rows to overflow a long — two orders
  * beyond `maxPartitionBytes`-sized parquet splits), followed by one
  * exchange of #partitions x d^2 rows summed in DECIMAL(38,0). The
  * iteration operates on d^2 numbers on the driver in BigInt.
  */
object Spectral {

  /** Exact micros quantization of one float — must match
    * `floor(CAST(v AS DOUBLE) * 1000000)` in SQL (cast is exact, the
    * multiply is the same IEEE double op in both engines). */
  private def micros(v: Float): Long = math.floor(v.toDouble * 1e6).toLong

  /** Truncating division toward zero — Scala BigInt `/` already has
    * exactly DuckDB's integer `//` semantics, so this is the identity
    * spelling kept (and spec-pinned) as the cross-engine contract.
    * (An earlier round floored here; DuckDB `//` truncates, so floor
    * would diverge on negative-not-divisible iterate components.) */
  def truncDiv(a: BigInt, b: BigInt): BigInt = a / b

  /** Second-moment matrix of the first `dims` coordinates:
    * `(i, j, m)` with `m = sum_x xs(i) * xs(j)` in micros^2, as
    * DECIMAL(38,0). One narrow corpus pass + one d^2-row exchange. */
  def momentMatrix(embs: DataFrame, dims: Int): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val d = dims
    // null embedding rows (unenriched documents) contribute no moment —
    // dropped before the typed fold, which would otherwise NPE
    val partials = embs
      .where(col("embedding").isNotNull)
      .select(slice(col("embedding"), 1, d).as("xs"))
      .as[Seq[Float]]
      .mapPartitions { it =>
        val acc = new Array[Long](d * d)
        var any = false
        it.foreach { xs =>
          require(xs.length >= d, s"embedding shorter than $d dims")
          val m = new Array[Long](d)
          var i = 0
          while (i < d) { m(i) = micros(xs(i)); i += 1 }
          i = 0
          while (i < d) {
            var j = 0
            while (j < d) { acc(i * d + j) += m(i) * m(j); j += 1 }
            i += 1
          }
          any = true
        }
        if (!any) Iterator.empty
        else Iterator.range(0, d * d)
          .map(k => (k / d, k % d, acc(k)))
      }.toDF("i", "j", "partial")
    partials.groupBy("i", "j")
      .agg(sum(col("partial").cast(DecimalType(38, 0))).as("m"))
  }

  /** `iters` power-iteration steps of `v <- normalize(M v)` from the
    * all-ones vector; returns `(dim, component_micros)` with components
    * scaled to max-abs 1e6. Exact: BigInt matvec, trunc-div rescale. */
  def dominantDirection(embs: DataFrame, dims: Int,
      iters: Int = 3): DataFrame = {
    val spark = embs.sparkSession
    import spark.implicits._
    val d = dims
    val m = Array.fill[BigInt](d, d)(BigInt(0))
    val cells = momentMatrix(embs, d).collect()
    // empty corpus: no moment rows -> no direction to extract; a defined
    // empty relation (not an NPE from null Gram cells) so compositions
    // over a filtered-to-nothing corpus degrade instead of crashing
    if (cells.isEmpty)
      return spark.emptyDataset[(Long, Long)].toDF("dim", "component_micros")
    cells.foreach { r =>
      m(r.getInt(0))(r.getInt(1)) =
        BigInt(r.getDecimal(2).toBigInteger)
    }
    var v = Array.fill[BigInt](d)(BigInt(1))
    (1 to iters).foreach { _ =>
      val next = Array.tabulate(d) { i =>
        (0 until d).map(j => m(i)(j) * v(j)).sum
      }
      val mx = next.map(_.abs).max
      require(mx.signum > 0, "zero iterate: degenerate moment matrix")
      v = next.map(x => truncDiv(x * BigInt(1000000), mx))
    }
    v.zipWithIndex
      .map { case (c, i) => (i.toLong, c.toLong) }.toSeq
      .toDF("dim", "component_micros")
  }
}
