package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (fingerprint groupBy), n-gram Jaccard
  * (rare-shingle candidate generation), MinHash+LSH (banded), and SimHash.
  *
  * Scale design: nothing here is all-pairs. Exact dedup is one hash groupBy;
  * Jaccard and MinHash generate candidates through *bucket joins* (shared
  * rare shingle / shared LSH band), so the join fan-out is bounded by bucket
  * size, not corpus size — the only shape that survives 100 TB. Signatures
  * (minhash/simhash) are computed with higher-order array functions inside
  * one narrow projection: no explode, no shuffle, codegen-friendly.
  */
object Dedup {

  /** 61-bit-safe prime field for minhash permutations. */
  val P = 1000000007L

  /** Deterministic 60-bit token hash both engines can compute:
    * first 15 hex chars of md5. */
  def hash60(t: Column): Column =
    conv(substring(md5(t), 1, 15), 16, 10).cast("long")

  /** Distinct word w-shingles of a document (space-joined token windows).
    * Guarded for short docs: Spark's `sequence(0, -1)` would count *down*,
    * so documents with fewer than w tokens explicitly yield an empty set. */
  def shingles(text: Column, w: Int = 3): Column = {
    val toks = TextAnalysis.tokens(text)
    val gen = transform(sequence(lit(0), size(toks) - w), i =>
      concat_ws(" ", (0 until w).map(o => element_at(toks, i + o + 1)): _*))
    when(size(toks) < w, array().cast("array<string>"))
      .otherwise(array_distinct(gen))
  }

  /** Exact dedup: keep-first per normalized-content fingerprint. */
  def exact(docs: DataFrame): DataFrame = {
    val fp = docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fingerprint"))
    val w = Window.partitionBy("fingerprint")
    fp.withColumn("group_size", count(lit(1)).over(w))
      .withColumn("keep", col("doc_id") === min("doc_id").over(w))
  }

  /** N-gram Jaccard near-dup pairs. Candidates = documents sharing a *rare*
    * shingle (appearing in at most `maxDf` docs) — the bucket-join guard
    * that keeps fan-out bounded at scale. Pairs with
    * 100*|A∩B| >= threshold*|A∪B| survive. */
  def ngramJaccardPairs(docs: DataFrame, w: Int = 3, maxDf: Int = 10,
                        thresholdPct: Int = 30): DataFrame = {
    val sh = docs.select(col("doc_id"), shingles(col("text"), w).as("sh"))
      .where(size(col("sh")) > 0)
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val rare = ex.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") <= maxDf)
    val rareEx = ex.join(rare.select("s"), "s")
    val cand = rareEx.toDF("s", "doc_a")
      .join(rareEx.toDF("s", "doc_b"), "s")
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val inter = ex.toDF("doc_a", "s")
      .join(cand, "doc_a")
      .join(ex.toDF("doc_b", "s"), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .withColumn("union_size", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * 100 >= col("union_size") * thresholdPct)
      .withColumn("jaccard_pct", floor(col("inter") * 100 / col("union_size")).cast("long"))
      .select("doc_a", "doc_b", "inter", "union_size", "jaccard_pct")
  }

  /** Deterministic permutation constants from the shared 31-bit LCG. */
  private def lcg(x: Long): Long = (1103515245L * x + 12345L) % 2147483648L
  def permA(j: Int): Long = 1 + lcg(j * 2L + 1) % (P - 1)
  def permB(j: Int): Long = lcg(j * 2L + 2) % P

  /** MinHash signature (numPerms mins over the shingle-hash set) computed
    * in one projection via higher-order functions. */
  def minhashSignature(sh: Column, numPerms: Int): Column = {
    val hs = transform(sh, s => hash60(s) % P)
    array((0 until numPerms).map { j =>
      array_min(transform(hs, h => (lit(permA(j)) * h + permB(j)) % P))
    }: _*)
  }

  /** MinHash+LSH near-dup candidate pairs with exact-Jaccard verification.
    * bands x rowsPerBand = signature length; a pair collides when any band
    * matches exactly. `maxBucket` caps degenerate buckets (boilerplate
    * shingle sets) so the within-bucket pair join stays bounded. */
  def minhashLshPairs(docs: DataFrame, numPerms: Int = 32, bands: Int = 8,
                      maxBucket: Int = 64, thresholdPct: Int = 30): DataFrame = {
    val r = numPerms / bands
    val sh = docs.select(col("doc_id"), shingles(col("text")).as("sh"))
      .where(size(col("sh")) > 0)
    val sig = sh.select(col("doc_id"), col("sh"),
      minhashSignature(col("sh"), numPerms).as("sig"))
    val banded = sig.select(col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          concat_ws("_", slice(col("sig"), b * r + 1, r)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.key").as("key"))
    val buckets = banded.groupBy("band", "key")
      .agg(collect_list("doc_id").as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
    val cand = buckets
      .select(explode(col("ids")).as("doc_a"), col("ids"))
      .select(col("doc_a"), explode(col("ids")).as("doc_b"))
      .where(col("doc_a") < col("doc_b"))
      .distinct()
    val sizes = sh.select(col("doc_id"), size(col("sh")).as("n"))
    val ex = sh.select(col("doc_id"), explode(col("sh")).as("s"))
    val inter = ex.toDF("doc_a", "s")
      .join(cand, "doc_a")
      .join(ex.toDF("doc_b", "s"), Seq("doc_b", "s"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.toDF("doc_a", "n_a"), "doc_a")
      .join(sizes.toDF("doc_b", "n_b"), "doc_b")
      .withColumn("union_size", col("n_a") + col("n_b") - col("inter"))
      .where(col("inter") * 100 >= col("union_size") * thresholdPct)
      .withColumn("jaccard_pct", floor(col("inter") * 100 / col("union_size")).cast("long"))
      .select("doc_a", "doc_b", "jaccard_pct")
  }

  /** 60-bit SimHash per document (docs with at least one token): per bit,
    * majority vote of token-hash bits, computed entirely with array
    * higher-order functions — one narrow projection, no explode. Bit
    * extraction uses a powers-of-two literal array + bitwiseAND (column
    * shift amounts are not supported by shiftright). */
  def simhash(docs: DataFrame): DataFrame = {
    val pows = array((0 until 60).map(i => lit(1L << i)): _*)
    val toks = TextAnalysis.tokens(col("text"))
    val hs = transform(toks, t => hash60(t))
    val zeros = transform(pows, _ => lit(0L))
    val sums = aggregate(hs, zeros, (acc, h) =>
      zip_with(acc, pows, (a, p) =>
        a + when(h.bitwiseAND(p) =!= 0, 1L).otherwise(-1L)))
    val sim = aggregate(
      zip_with(sums, pows, (s, p) => when(s >= 0, p).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc + x)
    docs.select(col("doc_id"), size(toks).as("nt"), sim.as("simhash"))
      .where(col("nt") > 0)
      .select("doc_id", "simhash")
  }
}
