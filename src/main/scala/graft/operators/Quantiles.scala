package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-merge grouped quantiles.
  *
  * The exact rank-statistic quantile family (`q_value_outliers`,
  * `q_doc_length_quantiles`) computes `row_number()` over a per-group
  * global sort — correct at any scale, but with FEW groups the sort's
  * parallelism is capped at the group count: 5 languages over 100 TB means
  * 5 sort tasks each holding 20 TB. This operator is the scale path for
  * that shape: Spark's `percentile_approx` (a Greenwald–Khanna quantile
  * sketch, Greenwald & Khanna, SIGMOD 2001) aggregates per-partition
  * sketches and merges them — map-side partials, bounded memory
  * (O(accuracy) per group per partition), no global sort, parallelism
  * follows the DATA not the group count.
  *
  * Accuracy contract (pinned by QuantilesSpec): with `accuracy > n` the
  * sketch retains every sample (the GK compression threshold
  * `2 * eps * n < 1` never merges) and `query(p)` returns the value at
  * rank `ceil(p * n)` — bit-identical to the exact rank-statistic form.
  * At scale, a smaller accuracy trades that exactness for the documented
  * `eps = 1/accuracy` relative-rank error.
  */
object Quantiles {

  /** One row per group: `groupCols*, n, q_0..q_{k-1}` — the approximate
    * `ps(i)` quantile of `valueCol` in column `q_i`. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], valueCol: String,
                      ps: Seq[Double], accuracy: Int): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0),
      s"percentiles must be in [0,1]: $ps")
    val pArr = ps.mkString("array(", ", ", ")")
    val agg = df.groupBy(groupCols.map(col): _*)
      .agg(expr(s"percentile_approx($valueCol, $pArr, $accuracy)").as("__qs"),
        count(lit(1)).as("n"))
    val qCols = ps.indices.map(i => element_at(col("__qs"), i + 1).as(s"q_$i"))
    agg.select(groupCols.map(col) ++ (col("n") +: qCols): _*)
  }

  /** Production-path tolerance gate for BOUNDED-accuracy sketches.
    *
    * The `accuracy > n` exactness pin used by the `_approx` oracle gates
    * is a correctness device, not the production configuration — at 100x
    * it makes the sketch retain every sample and the "approx" tier
    * slower than the exact one (PLANS.md round-10 100x probe). The
    * production path is a FIXED small accuracy, whose answer is not
    * SQL-reproducible — but its rank CONTRACT is checkable exactly: GK
    * guarantees the returned value's rank is within `eps * n` of the
    * target rank (`eps = 1/accuracy`, Greenwald & Khanna SIGMOD 2001).
    *
    * This operator runs the bounded sketch, then VERIFIES the contract
    * against the corpus: one broadcast join of the (groups x ps)-sized
    * claims relation back onto the fact table and a single counting
    * aggregate recover each claimed value's exact rank interval
    * `[below+1, at_or_below]`; the claim passes iff that interval
    * intersects `[t - tol, t + tol]` for target rank `t = ceil(p * n)`
    * and `tol = n div accuracy + 1` (the +1 absorbs the rank-convention
    * rounding at either end). Output per (group, p): `n, tol, ok` — all
    * BIGINT/boolean, so the gate's oracle can re-derive n and tol from
    * the corpus and pin `ok = true`; a sketch-merge bug surfaces as a
    * flipped `ok`, not a hash-drifting DOUBLE.
    *
    * Scale shape: the sketch pass is the map-side-merge aggregate
    * (bounded O(accuracy) state), the verification pass is one broadcast
    * join + one combine-heavy aggregate over the fact table — two linear
    * passes, no sort, no wide shuffle beyond the group aggregates. */
  def boundedQuantileCheck(df: DataFrame, groupCols: Seq[String],
                           valueCol: String, ps: Seq[Double],
                           accuracy: Int): DataFrame = {
    require(ps.forall(p => p > 0.0 && p <= 1.0), s"percentiles in (0,1]: $ps")
    val base = df.where(col(valueCol).isNotNull)
    val q = approxQuantiles(base, groupCols, valueCol, ps, accuracy)
    // unpivot the claims: one row per (group, p_micros, claimed)
    val pStructs = ps.zipWithIndex.map { case (p, i) =>
      struct(lit(math.round(p * 1000000)).as("p_micros"),
        col(s"q_$i").as("claimed"))
    }
    val claims = q.select(
      groupCols.map(col) :+ explode(array(pStructs: _*)).as("c"): _*)
      .select(groupCols.map(col) ++ Seq(col("c.p_micros"),
        col("c.claimed")): _*)
    rankContractCheck(base, claims, groupCols, valueCol, accuracy)
  }

  /** The verification half of [[boundedQuantileCheck]], factored so a
    * poisoned claims relation can prove the gate FAILS (QuantilesSpec):
    * given `claims(groupCols*, p_micros, claimed)`, recover each claimed
    * value's exact rank interval from `base` and test the GK contract.
    * `n` is re-counted here from `base` (never trusted from the sketch
    * side), so a sketch that miscounts is caught too. */
  def rankContractCheck(base: DataFrame, claims: DataFrame,
                        groupCols: Seq[String], valueCol: String,
                        accuracy: Int): DataFrame = {
    // exact rank interval of each claimed value: one counting pass
    val ranked = base.join(broadcast(claims), groupCols)
      .groupBy((groupCols.map(col) :+ col("p_micros")): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(col(valueCol) < col("claimed"), 1L).otherwise(0L)).as("below"),
        sum(when(col(valueCol) <= col("claimed"), 1L).otherwise(0L)).as("at_or_below"))
    val t = expr("(p_micros * n + 999999) div 1000000")
    val tol = expr(s"n div ${accuracy.toLong} + 1")
    ranked.select(
      groupCols.map(col) ++ Seq(col("p_micros"), col("n"), tol.as("tol"),
        ((col("below") + 1L <= t + tol) && (col("at_or_below") >= t - tol))
          .as("ok")): _*)
  }

  /** EXACT rank statistics without the per-group monolithic sort — the
    * scale path for the exact tier itself (the sketch tiers above trade
    * exactness; this one doesn't).
    *
    * The classic distributed-selection shape: range-partition the
    * `(groupCols, value)` relation into `partitions` ordered cells, take
    * per-cell per-group counts (a `partitions x groups` relation —
    * metadata-sized), locate on the driver which cell holds each target
    * rank and the residual rank within it, then rank ONLY inside the
    * <= groups x targets cells that matter (each ~n/partitions rows).
    * Exact for any partitioner split — counts are measured after
    * partitioning, and a boundary-straddling tie still yields the same
    * value at the global rank whichever cell serves it. Parallelism is
    * `partitions` for the counting pass and cell-count for the selection
    * pass, never the group count: 5 groups over 100 TB stop being 5
    * 20 TB sort tasks (the `q_value_outliers` 100x inversion this
    * replaces, 37.5x wall at 100x data) and become `partitions` counting
    * tasks plus <= 10 small cell sorts.
    *
    * `targets` maps a label to the 1-based rank wanted per group, as a
    * function of the group's non-null count n (e.g. `(n+3) div 4` for
    * the q1 rank convention). NULL values are outside the rank domain
    * (the [[Histogram]] convention). Returns one EAGER row per group:
    * `groupCols*, n, <label>...` — eager because the partitioned
    * relation is persisted for exactly the two passes and unpersisted
    * before returning; the result is groups-sized by construction. */
  def exactRankStatistics(df: DataFrame, groupCols: Seq[String],
                          valueCol: String,
                          targets: Seq[(String, Long => Long)],
                          partitions: Int = 64): DataFrame = {
    require(targets.nonEmpty, "at least one target rank")
    val spark = df.sparkSession
    val g = groupCols.map(col)
    val vals = df.select(g :+ col(valueCol).as("__v"): _*)
      .where(col("__v").isNotNull)
    val parts = vals
      .repartitionByRange(partitions, g :+ col("__v"): _*)
      .withColumn("__pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // pass 1: per-cell per-group counts -> driver (partitions x groups)
      val histRows = parts.groupBy(col("__pid") +: g: _*)
        .agg(count(lit(1)).as("__cnt")).collect()
      val byGroup = histRows.toSeq
        .map(r => (r.toSeq.slice(1, 1 + groupCols.size),
          r.getInt(0), r.getLong(1 + groupCols.size)))
        .groupBy(_._1)
      // locate each (group, label) target: owning cell + residual rank
      val groupN = byGroup.map { case (k, cells) => k -> cells.map(_._3).sum }
      val cellTargets = byGroup.toSeq.flatMap { case (key, cells) =>
        val n = groupN(key)
        val ordered = cells.sortBy(_._2)
        targets.map { case (label, rankOf) =>
          val r = rankOf(n)
          require(r >= 1 && r <= n,
            s"target rank $label=$r outside [1, $n] for group $key")
          var cum = 0L
          val (pid, residual) = ordered.collectFirst {
            case (_, p, c) if { val hit = cum + c >= r; if (!hit) cum += c; hit } =>
              (p, r - cum)
          }.get
          org.apache.spark.sql.Row.fromSeq(key ++ Seq(pid, label, residual))
        }
      }
      import org.apache.spark.sql.types.{IntegerType, LongType, StringType, StructField, StructType}
      import scala.jdk.CollectionConverters._
      val groupFields = groupCols.map(c => parts.schema(c))
      val valueType = parts.schema("__v").dataType
      val targetSchema = StructType(groupFields ++ Seq(
        StructField("__pid", IntegerType),
        StructField("__label", StringType),
        StructField("__residual", LongType)))
      val targetDf = spark.createDataFrame(cellTargets.asJava, targetSchema)
      // pass 2: rank only inside the selected cells; a cell hosting two
      // targets fans each row out per label, so the window partitions on
      // the label too and each copy ranks independently
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(g ++ Seq(col("__pid"), col("__label")): _*)
        .orderBy(col("__v"))
      val picked = parts.join(broadcast(targetDf), groupCols :+ "__pid")
        .withColumn("__rn", row_number().over(w))
        .where(col("__rn") === col("__residual"))
        .select(g ++ Seq(col("__label"), col("__v")): _*)
        .collect()
      val valueAt = picked.map { r =>
        (r.toSeq.take(groupCols.size), r.getString(groupCols.size)) ->
          r.get(groupCols.size + 1)
      }.toMap
      val outRows = byGroup.keys.toSeq.sortBy(_.mkString(""))
        .map { key =>
          org.apache.spark.sql.Row.fromSeq(
            key ++ (groupN(key) +: targets.map { case (label, _) =>
              valueAt((key, label)) }))
        }
      val outSchema = StructType(groupFields ++
        (StructField("n", LongType) +:
          targets.map { case (label, _) => StructField(label, valueType) }))
      spark.createDataFrame(outRows.asJava, outSchema)
    } finally parts.unpersist()
  }

  /** Tukey IQR upper fences per group from sketched quartiles:
    * `groupCols*, hi` with `hi = q3 + 1.5 * (q3 - q1)` — the same IEEE
    * expression, in the same order, as the exact-fence queries, so equal
    * quartiles give bit-equal fences. */
  def iqrUpperFences(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     accuracy: Int): DataFrame = {
    val q = approxQuantiles(df, groupCols, valueCol, Seq(0.25, 0.75), accuracy)
    q.select(groupCols.map(col) :+
      (col("q_1") + lit(1.5) * (col("q_1") - col("q_0"))).as("hi"): _*)
  }

  /** Rows of `df` whose `valueCol` exceeds the group's sketched upper
    * fence. The fence relation is one row per group — broadcast, so the
    * fact side is filtered with zero additional shuffles. */
  def iqrOutliers(df: DataFrame, groupCols: Seq[String], valueCol: String,
                  accuracy: Int): DataFrame = {
    val fences = iqrUpperFences(df, groupCols, valueCol, accuracy)
    df.join(broadcast(fences), groupCols)
      .where(col(valueCol) > col("hi"))
      .drop("hi")
  }
}
