package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Determinism strategy: embeddings are scaled to integer micros per
  * component (`floor(v * 1e6)`); dot products and squared norms are then
  * *exact* BIGINT arithmetic, and the cosine ordering key is built from
  * exact integers with only IEEE-deterministic double ops (sqrt, divide) —
  * identical in Spark and DuckDB regardless of evaluation order.
  *
  * Scale design: `bruteTopK` broadcasts the (small) query set and never
  * shuffles the candidate side except for the final top-k; `lshTopK` is the
  * 100 TB path — sign-random-projection buckets bound the candidate join.
  */
object Similarity {

  /** Integer-micros view of a float vector (exact from here on). */
  def scaledVec(emb: Column): Column =
    transform(emb, v => floor(v.cast("double") * 1000000).cast("long"))

  /** Exact BIGINT dot product of two scaled vectors. */
  def dotLong(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  /** Embeddings with scaled vector + exact squared norm, zero vectors
    * dropped (cosine undefined). */
  def prepared(embs: DataFrame): DataFrame =
    embs.select(col("vec_id"), scaledVec(col("embedding")).as("xs"))
      .withColumn("norm2", dotLong(col("xs"), col("xs")))
      .where(col("norm2") > 0)

  /** IEEE-deterministic cosine from exact integers. */
  def cosine(dot: Column, n1: Column, n2: Column): Column =
    dot.cast("double") / (sqrt(n1.cast("double")) * sqrt(n2.cast("double")))

  /** Exact near-duplicate pairs with cosine >= tauPct/100, decided entirely
    * in integer arithmetic (cross-multiplied squares — no sqrt, no floats):
    * dot >= 0 and 10000*dot^2 >= tauPct^2 * n1 * n2. */
  def nearDupExact(embs: DataFrame, tauPct: Int = 95): DataFrame = {
    val e = prepared(embs)
    val a = e.toDF("vec_a", "xs_a", "n_a")
    val b = e.toDF("vec_b", "xs_b", "n_b")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("dot", dotLong(col("xs_a"), col("xs_b")))
      .where(col("dot") >= 0 &&
        dec(col("dot")) * dec(col("dot")) * 10000 >=
          dec(col("n_a")) * dec(col("n_b")) * (tauPct * tauPct))
      .select(col("vec_a"), col("vec_b"), col("dot"), col("n_a"), col("n_b"))
  }

  /** Brute-force cosine top-k per query vector (queries broadcast). */
  def bruteTopK(embs: DataFrame, queryPred: Column, k: Int = 5): DataFrame = {
    val e = prepared(embs)
    val q = broadcast(e.where(queryPred).toDF("query_id", "xs_q", "n_q"))
    val pairs = e.toDF("neighbor_id", "xs", "n")
      .join(q, col("neighbor_id") =!= col("query_id"))
      .withColumn("dot", dotLong(col("xs_q"), col("xs")))
      .withColumn("cos", cosine(col("dot"), col("n_q"), col("n")))
    pairs.withColumn("rank", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        floor(col("cos") * 1000000).cast("long").as("cos_micros"))
  }

  /** Deterministic ±1 hyperplane component from the shared LCG. */
  private def lcg(x: Long): Long = (1103515245L * x + 12345L) % 2147483648L

  /** Sign-random-projection bucket key: `planes` sign bits of LCG-derived
    * hyperplane dots. The LSH scale path for ANN: candidates share a
    * bucket, so the join is bucket-local. */
  def srpBucket(xs: Column, dim: Int, planes: Int = 12): Column = {
    val bits = (0 until planes).map { p =>
      val plane = array((0 until dim).map(i =>
        lit(if (lcg(p * dim.toLong + i) % 2 == 0) 1L else -1L)): _*)
      when(dotLong(xs, plane) >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** LSH-bucketed approximate near-dup pairs (same integer decision rule as
    * [[nearDupExact]], restricted to within-bucket candidates). */
  def lshNearDup(embs: DataFrame, dim: Int, tauPct: Int = 95,
                 planes: Int = 12): DataFrame = {
    val e = prepared(embs).withColumn("bucket", srpBucket(col("xs"), dim, planes))
    val a = e.toDF("vec_a", "xs_a", "n_a", "bucket")
    val b = e.toDF("vec_b", "xs_b", "n_b", "bucket")
    val dec = (c: Column) => c.cast("decimal(38,0)")
    a.join(b, Seq("bucket"))
      .where(col("vec_a") < col("vec_b"))
      .withColumn("dot", dotLong(col("xs_a"), col("xs_b")))
      .where(col("dot") >= 0 &&
        dec(col("dot")) * dec(col("dot")) * 10000 >=
          dec(col("n_a")) * dec(col("n_b")) * (tauPct * tauPct))
      .select(col("vec_a"), col("vec_b"), col("dot"))
      .distinct()
  }
}
