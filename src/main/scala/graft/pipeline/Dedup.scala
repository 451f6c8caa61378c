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
    *
    * Implementation note: the windows are built by zipping w shifted slices
    * of the token array at *argument* level. Referencing the token
    * expression inside the transform lambda (e.g. `element_at(toks, i+o)`)
    * would re-evaluate the whole regexp tokenization per element — O(n²)
    * regex work per document (measured 20x slower at sf0.1). Short docs
    * (< w tokens) explicitly yield an empty set: Spark's `sequence(0, -1)`
    * counts down rather than producing nothing. */
  def shingles(text: Column, w: Int = 3): Column =
    shinglesFromTokens(TextAnalysis.tokens(text), w)

  /** Same, over an already-materialized token array column (preferred in
    * pipelines: tokenization happens once in its own projection instead of
    * 2w+1 times at argument level). */
  def shinglesFromTokens(toks: Column, w: Int = 3): Column = {
    val n = size(toks) - (w - 1)
    val z = arrays_zip((0 until w).map(o => slice(toks, lit(o + 1), n)): _*)
    val gen = transform(z, s =>
      concat_ws(" ", (0 until w).map(o => s.getField(o.toString)): _*))
    when(size(toks) < w, array().cast("array<string>"))
      .otherwise(array_distinct(gen))
  }

  /** (doc_id, sh) relation with single-pass tokenization. */
  private def shingleDf(docs: DataFrame, w: Int = 3): DataFrame =
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"), shinglesFromTokens(col("toks"), w).as("sh"))
      .where(size(col("sh")) > 0)

  /** (doc_id, hs): 60-bit md5 hashes of the distinct word w-shingles in
    * first-occurrence order; docs with fewer than w tokens dropped.
    *
    * Tokenization stays the declarative builtin (identical to the DuckDB
    * oracle's `regexp_extract_all(lower(text), ...)`), but window assembly
    * and hashing run as a tight per-partition loop: the higher-order-function
    * formulation (`arrays_zip`/`transform`/`concat_ws` + `conv(md5(...))`
    * per element) falls out of whole-stage codegen and dominated the dedup
    * pipelines' runtime. Values are bit-identical to
    * `hash60(shinglesFromTokens(...))` (DedupSpec asserts agreement). */
  def hashedShingleDf(docs: DataFrame, w: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      // NULL text tokenizes to a NULL array (size -1): drop it here like the
      // declarative path's size guard did, instead of NPE-ing in the loop
      .where(size(col("toks")) > 0)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, toksSeq) =>
          val toks = toksSeq.toArray
          val n = toks.length - (w - 1)
          if (n <= 0) None
          else {
            val seen = new java.util.LinkedHashSet[String]()
            var i = 0
            while (i < n) {
              val sb = new java.lang.StringBuilder(toks(i))
              var o = 1
              while (o < w) { sb.append(' ').append(toks(i + o)); o += 1 }
              seen.add(sb.toString)
              i += 1
            }
            val arr = new Array[Long](seen.size())
            val itr = seen.iterator()
            var j = 0
            while (itr.hasNext) { arr(j) = md5Top60(md, itr.next()); j += 1 }
            Some((id, arr))
          }
        }
      }.toDF("doc_id", "hs")
  }

  /** (doc_a, doc_b, inter, union_size): per-candidate-pair set intersection
    * of the two docs' hashed shingle arrays, computed as a primitive loop —
    * the alternative (exploding both sides and re-joining on the shingle
    * key) fans out to |pairs| x |shingles| rows. The pair->array joins are
    * plain equi-joins: AQE broadcasts the compact array side when it fits;
    * at fleet scale they degrade gracefully to shuffle joins keyed by the
    * bounded candidate set. Intersection counts DISTINCT common hash values
    * (mirrors DuckDB `list_intersect` in the oracle). */
  private def pairOverlap(cand: DataFrame, hdf: DataFrame): DataFrame = {
    val spark = cand.sparkSession
    import spark.implicits._
    cand.join(hdf.toDF("doc_a", "hs_a"), "doc_a")
      .join(hdf.toDF("doc_b", "hs_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hs_a"), col("hs_b"))
      .as[(Long, Long, Array[Long], Array[Long])]
      .mapPartitions { it =>
        val set = new java.util.HashSet[java.lang.Long]()
        it.map { case (a, b, ha, hb) =>
          set.clear()
          var i = 0
          while (i < ha.length) { set.add(ha(i)); i += 1 }
          var inter = 0L
          var j = 0
          while (j < hb.length) { if (set.remove(hb(j))) inter += 1; j += 1 }
          (a, b, inter, ha.length.toLong + hb.length - inter)
        }
      }.toDF("doc_a", "doc_b", "inter", "union_size")
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
    // the hashed-shingle relation feeds every downstream join — persist the
    // compact per-doc arrays once; consumers (sizes, two explode sides, the
    // rare-shingle filter) re-derive from the cache with cheap narrow ops.
    // Shingles enter the joins as 60-bit md5 hashes: candidate and
    // intersection joins run on BIGINT keys instead of multi-word strings —
    // far less shuffle volume and cheaper probes. The DuckDB oracle hashes
    // identically, so even md5 collisions (~2^-60) agree across engines.
    val hdf = hashedShingleDf(docs, w).persist()
    val ex = hdf.select(col("doc_id"), explode(col("hs")).as("s"))
    val rare = ex.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") <= maxDf)
    val rareEx = ex.join(rare.select("s"), "s")
    val cand = rareEx.toDF("s", "doc_a")
      .join(rareEx.toDF("s", "doc_b"), "s")
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    pairOverlap(cand, hdf)
      .where(col("inter") * 100 >= col("union_size") * thresholdPct)
      .withColumn("jaccard_pct", floor(col("inter") * 100 / col("union_size")).cast("long"))
      .select("doc_a", "doc_b", "inter", "union_size", "jaccard_pct")
  }

  /** Deterministic permutation constants from the shared 31-bit LCG. */
  private def lcg(x: Long): Long = (1103515245L * x + 12345L) % 2147483648L
  def permA(j: Int): Long = 1 + lcg(j * 2L + 1) % (P - 1)
  def permB(j: Int): Long = lcg(j * 2L + 2) % P

  /** MinHash signature (numPerms mins over the shingle-hash set) computed
    * in a *single* aggregate pass over the shingle array — one traversal
    * updates all permutation minima at once (numPerms separate array_min
    * scans would materialize numPerms intermediate arrays per row). */
  def minhashSignature(sh: Column, numPerms: Int): Column = {
    val ab = array((0 until numPerms).map(j =>
      struct(lit(permA(j)).as("a"), lit(permB(j)).as("b"))): _*)
    val init = transform(ab, _ => lit(Long.MaxValue))
    val hs = transform(sh, s => hash60(s) % P)
    aggregate(hs, init, (acc, h) =>
      zip_with(acc, ab, (m, c) =>
        least(m, (c.getField("a") * h + c.getField("b")) % P)))
  }

  /** MinHash+LSH near-dup candidate pairs with exact-Jaccard verification.
    * bands x rowsPerBand = signature length; a pair collides when any band
    * matches exactly. `maxBucket` caps degenerate buckets (boilerplate
    * shingle sets) so the within-bucket pair join stays bounded. */
  def minhashLshPairs(docs: DataFrame, numPerms: Int = 32, bands: Int = 8,
                      maxBucket: Int = 64, thresholdPct: Int = 30): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val r = numPerms / bands
    val hdf = hashedShingleDf(docs).persist()
    // signature via a tight primitive loop per partition over the already-
    // hashed shingles: identical values to minhashSignature, ~10x faster
    // than interpreted HOF evaluation
    val as = (0 until numPerms).map(permA).toArray
    val bs = (0 until numPerms).map(permB).toArray
    val sig = hdf.as[(Long, Array[Long])].mapPartitions { it =>
      it.map { case (docId, hs) =>
        val mins = Array.fill(numPerms)(Long.MaxValue)
        var i = 0
        while (i < hs.length) {
          val h = hs(i) % P
          var j = 0
          while (j < numPerms) {
            val v = (as(j) * h + bs(j)) % P
            if (v < mins(j)) mins(j) = v
            j += 1
          }
          i += 1
        }
        (docId, mins.toSeq)
      }
    }.toDF("doc_id", "sig")
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
    pairOverlap(cand, hdf)
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
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .where(size(col("toks")) > 0)
      .as[(Long, Seq[String])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (docId, toks) =>
          val counts = new Array[Int](60)
          toks.foreach { t =>
            val h = md5Top60(md, t)
            var b = 0
            while (b < 60) {
              if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
              b += 1
            }
          }
          var sim = 0L
          var b = 0
          while (b < 60) { if (counts(b) >= 0) sim |= 1L << b; b += 1 }
          (docId, sim)
        }
      }.toDF("doc_id", "simhash")
  }

  /** SimHash near-dup pairs with hamming distance <= maxHamming.
    *
    * Candidate generation bands the 60-bit signature into `bands` chunks of
    * `bandBits` bits; by pigeonhole, any pair within hamming distance
    * `bands - 1` shares at least one identical band, so with the defaults
    * (4 x 15 bits, maxHamming 3) banding itself loses nothing. Recall is
    * exact *up to the `maxBucket` cap*: a bucket larger than `maxBucket`
    * (a degenerate near-identical cluster) is dropped whole to bound the
    * pairing fan-out, sacrificing that cluster's pairs — the same
    * deliberate guard as the MinHash path; raise `maxBucket` for exact
    * recall on clustered corpora. Verification is the codegen'd
    * `bit_count(xor)` builtin — no UDF. */
  def simhashPairs(docs: DataFrame, maxHamming: Int = 3, bands: Int = 4,
                   bandBits: Int = 15, maxBucket: Int = 64): DataFrame = {
    val sims = simhash(docs)
    val mask = (1L << bandBits) - 1
    val banded = sims.select(col("doc_id"), col("simhash"),
      explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask)).as("key"))
      }: _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.band").as("band"), col("bk.key").as("key"))
    val buckets = banded.groupBy("band", "key")
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("ids"))
      .where(size(col("ids")).between(2, maxBucket))
    val cand = buckets
      .select(explode(col("ids")).as("a"), col("ids"))
      .select(col("a.doc_id").as("doc_a"), col("a.simhash").as("sim_a"),
        explode(col("ids")).as("b"))
      .select(col("doc_a"), col("sim_a"),
        col("b.doc_id").as("doc_b"), col("b.simhash").as("sim_b"))
      .where(col("doc_a") < col("doc_b"))
      .distinct()
    cand
      .select(col("doc_a"), col("doc_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
  }

  /** Benchmark decontamination: corpus documents sharing at least
    * `minShared` distinct word w-shingles with *any* benchmark document —
    * the standard test-set-leakage check a training pipeline runs before
    * shipping a corpus.
    *
    * Scale shape: the benchmark side is the small one by nature (eval sets
    * are thousands of documents, the corpus is the 100 TB side). Its
    * distinct shingle set broadcasts; the corpus explodes its shingles in a
    * narrow flatMap and the broadcast join filters immediately, so the only
    * shuffle is the per-doc count of *matching* rows — proportional to the
    * contamination overlap, not the corpus. */
  def contamination(corpus: DataFrame, benchmark: DataFrame, w: Int = 3,
                    minShared: Int = 3,
                    maxBenchmarkShingles: Long = 5000000L): DataFrame = {
    val benchSh = hashedShingleDf(benchmark, w)
      .select(explode(col("hs")).as("h")).distinct()
      .persist()
    val nBench = benchSh.count()
    require(nBench <= maxBenchmarkShingles,
      s"contamination broadcasts the benchmark shingle set: $nBench " +
        s"distinct shingles > maxBenchmarkShingles=$maxBenchmarkShingles; " +
        "split the benchmark into batches or raise the bound explicitly")
    hashedShingleDf(corpus, w)
      .select(col("doc_id"), explode(col("hs")).as("h"))
      .join(broadcast(benchSh), "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  /** Near-dup *cluster resolution*: connected components over pair edges,
    * labeling every document with the smallest doc_id of its component —
    * the canonical-representative step that turns pair lists (from
    * [[minhashLshPairs]] / [[simhashPairs]] / [[ngramJaccardPairs]]) into a
    * keep-one-per-cluster dedup decision.
    *
    * Algorithm: distributed min-label propagation. Each round joins the
    * (bidirectional) edge list with current labels and takes the per-node
    * minimum — one shuffle per round, all relational, no driver-side graph.
    * Convergence is detected from the monotone label sum (labels only
    * decrease), a single scalar aggregate per round. Rounds needed equal
    * the component *diameter*: LSH near-dup components are near-cliques
    * (every member shares a band bucket with most others), so 2–4 rounds
    * close them at any corpus size. Pathological chain-shaped graphs would
    * need the star-contraction variants (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — not the shape
    * near-dup buckets produce. Each round's labels are
    * `localCheckpoint`ed: persist() alone caches *data* but keeps the
    * logical plan, and since every round references the previous labels
    * twice (directly and through the neighbor join) the plan tree doubles
    * per round — exponential analysis memory by round ~20. Checkpointing
    * truncates the lineage so every round plans against a materialized
    * relation.
    *
    * Returns (doc_id, cluster_id) for every document that appears in at
    * least one pair; unpaired documents are their own singleton clusters by
    * definition and are left to the caller (they need no join to decide). */
  def resolveClusters(pairs: DataFrame, maxRounds: Int = 25): DataFrame = {
    val spark = pairs.sparkSession
    // both edge directions from ONE scan of the (possibly expensive) pair
    // relation — a union of two projections would evaluate it twice, since
    // Spark shares no subplans across DataFrame branches
    val edges = pairs.select(explode(array(
        struct(col("doc_a").as("u"), col("doc_b").as("v")),
        struct(col("doc_b").as("u"), col("doc_a").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .persist()
    var labels = edges.select(col("u").as("doc_id")).distinct()
      .withColumn("cluster_id", col("doc_id"))
      .localCheckpoint(true)
    // coalesce: an empty pair relation must yield an empty result, not a
    // NULL-sum crash
    var prevSum = labels.agg(coalesce(sum("cluster_id"), lit(0L)))
      .head().getLong(0)
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("doc_id", "v"), "v")
        .groupBy(col("u").as("doc_id"))
        .agg(min("cluster_id").as("nbr_min"))
      val next = labels
        .join(nbrMin, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      val nextSum = next.agg(coalesce(sum("cluster_id"), lit(0L)))
        .head().getLong(0)
      labels = next
      converged = nextSum == prevSum
      prevSum = nextSum
      round += 1
    }
    edges.unpersist()
    // no silent caps: returning part-propagated labels would ship wrong
    // clusters (a >maxRounds-diameter chain keeps local minima as labels)
    if (!converged)
      throw new IllegalStateException(
        s"resolveClusters did not converge within maxRounds=$maxRounds " +
          "(a component's diameter exceeds the round budget); raise " +
          "maxRounds, or pre-contract chain-shaped graphs")
    labels
  }

  /** Top 60 bits of md5 — bit-identical to `hash60` (first 15 hex chars
    * parsed base 16), computed without string round-trips. Public: the
    * rolling-hash chunker reuses it. */
  def md5Top60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }
}
