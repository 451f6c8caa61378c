package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators for a training-data pipeline: PII
  * scrubbing, rule-based quality filtering (the Gopher/C4 shape),
  * duplicate-block (boilerplate) removal, and token-budget sequence
  * packing.
  *
  * Everything is declarative DataFrame code over codegen'd built-ins —
  * regexp/array/higher-order functions and window aggregates; the only
  * shuffles are the ones the semantics require (a global block-frequency
  * count, a per-bucket packing window), and each is on a key that
  * hash-distributes evenly at any corpus size. Every expression has an
  * exact DuckDB spelling (integer-only outputs, RE2-compatible regexes),
  * so the whole file is oracle-checkable bit-for-bit.
  */
object Curation {

  // =================================================================
  // PII detection + redaction
  // =================================================================

  /** One scrubbing rule: a detection regex and its redaction token. The
    * regexes are deliberately RE2-safe (no backreferences/lookaround) so
    * the same pattern string runs in Spark (Java regex), DuckDB (RE2),
    * and the usual scan-at-ingest tools. */
  final case class PiiRule(name: String, regex: String, replacement: String)

  /** The standard scrubbing set, most-specific first: the email rule must
    * run before the bare-IP rule (an address's host part could otherwise
    * be half-eaten), and the phone rule before SSN (both are dash-joined
    * digit runs; the `+1-` prefix disambiguates, but only while intact). */
  val DefaultPiiRules: Seq[PiiRule] = Seq(
    PiiRule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    PiiRule("phone", "\\+1-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    PiiRule("ssn", "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b", "<SSN>"),
    PiiRule("ip", "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b", "<IP>"))

  /** Per-document PII scan + redaction: one `n_<rule>` count column per
    * rule (counted on the ORIGINAL text, so rule order cannot hide a
    * hit), a total, and the text with every match replaced by the rule's
    * placeholder, applied in rule order. A narrow projection — each rule
    * is one codegen'd regexp pass; no shuffle, scales linearly. */
  def piiScan(docs: DataFrame, rules: Seq[PiiRule] = DefaultPiiRules): DataFrame = {
    val counts = rules.map(r =>
      size(regexp_extract_all(col("text"), lit(r.regex), lit(0)))
        .cast("long").as(s"n_${r.name}"))
    val redacted = rules.foldLeft(col("text")) { (acc, r) =>
      regexp_replace(acc, lit(r.regex), lit(r.replacement))
    }
    docs.select(
      (col("doc_id") +: counts :+ redacted.as("redacted")): _*)
      .withColumn("n_pii",
        rules.map(r => col(s"n_${r.name}")).reduce(_ + _))
  }

  // =================================================================
  // Rule-based quality filtering (Gopher/C4-style)
  // =================================================================

  /** Per-document quality verdict from the classic heuristic rule set
    * (Rae et al., "Scaling Language Models: ... Gopher", 2021, §A1.1;
    * Raffel et al., C4, 2020): token-count bounds, mean-word-length
    * bounds, numeral-token share, and stopword presence. Emits the exact
    * integer signals each rule reads, the boolean verdict, and a stable
    * comma-joined reason string (alphabetical, so it hash-compares across
    * engines). Pure narrow projection; the tokenizer runs once (same
    * two-project shape as [[TextAnalysis.textStats]]). */
  def qualityRules(docs: DataFrame,
                   minTokens: Int = 5, maxTokens: Int = 100000,
                   minMeanLenMicros: Long = 2000000L,
                   maxMeanLenMicros: Long = 12000000L,
                   maxNumeralPct: Int = 30,
                   minStopHits: Int = 1): DataFrame = {
    val stats = docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        aggregate(col("toks"), lit(0L), (acc, t) => acc + length(t))
          .as("token_chars"),
        size(filter(col("toks"), t => t.rlike("^[0-9]+$")))
          .cast("long").as("n_numerals"),
        TextAnalysis.stopwordCount(col("toks"), TextAnalysis.EnStop)
          .cast("long").as("stop_hits"))
      .withColumn("mean_len_micros",
        when(col("n_tokens") > 0,
          expr("token_chars * 1000000 div n_tokens")).otherwise(lit(0L)))
    val fails = Seq(
      "too_few_tokens" -> (col("n_tokens") < minTokens),
      "too_many_tokens" -> (col("n_tokens") > maxTokens),
      "mean_word_short" -> (col("n_tokens") >= minTokens &&
        col("mean_len_micros") < minMeanLenMicros),
      "mean_word_long" -> (col("mean_len_micros") > maxMeanLenMicros),
      "numeral_heavy" -> (col("n_numerals") * 100 > col("n_tokens") * maxNumeralPct),
      "no_stopwords" -> (col("stop_hits") < minStopHits))
    // reasons sorted by rule name for a stable cross-engine string
    val reason = array_join(
      filter(array(fails.sortBy(_._1).map { case (n, c) =>
        when(c, lit(n)).otherwise(lit(null).cast("string"))
      }: _*), x => x.isNotNull), ",")
    stats
      .withColumn("keep", !fails.map(_._2).reduce(_ || _))
      .withColumn("reasons", reason)
  }

  // =================================================================
  // Duplicate-block (boilerplate) removal
  // =================================================================

  /** Remove duplicated fixed-width token blocks from every document — the
    * paragraph/boilerplate dedup pass (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", 2022, applies it at the
    * substring level; Dolma/CCNet at the paragraph level; the driver
    * corpus has no line structure, so the unit here is a `w`-token block,
    * stride `w`, trailing partial block included).
    *
    * A block whose text occurs in more than `maxDf` DISTINCT documents is
    * boilerplate: every occurrence is dropped (not keep-first — the
    * shared block adds no information to any document; exact whole-doc
    * dedup is [[Dedup.exact]]'s job). Documents are rebuilt from their
    * surviving blocks in order.
    *
    * Scale shape: block df is one hash-shuffled count on the 60-bit block
    * hash, the verdict joins back on that same key (co-partitioned — AQE
    * reuses the exchange), and reassembly is a per-doc sort_array over at
    * most tokens/w entries. Blocks enter both shuffles as BIGINT hashes,
    * not strings; the oracle hashes identically, so even a md5 collision
    * (~2^-60) agrees across engines. */
  def dropDuplicateBlocks(docs: DataFrame, w: Int = 10,
                          maxDf: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
    // `div`, not `/`: Column./ is DOUBLE division. Token-less docs are
    // excluded BEFORE sequence(): sequence(0, -1) does not return empty —
    // it infers step -1 and yields [0, -1].
    val nBlocks = expr(s"(size(toks) + ${w - 1}) div $w")
    val blocks = toks
      .where(size(col("toks")) > 0)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0L), nBlocks - 1),
          b => array_join(slice(col("toks"), (b * w + 1).cast("int"), lit(w)), " "))
        ).as(Seq("pos", "blk")))
    // 60-bit hash of the block string — same primitive loop as the
    // shingle path, so the shuffles below move BIGINTs
    val hashed = blocks.as[(Long, Int, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, pos, blk) => (id, pos, blk, Dedup.md5Top60(md, blk)) }
      }.toDF("doc_id", "pos", "blk", "h")
      .persist() // feeds the df count AND the verdict join; no subplan sharing
    val dupes = hashed.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("df"))
      .where(col("df") > maxDf)
    val kept = hashed.join(dupes.select("h"), Seq("h"), "left_anti")
    val rebuilt = kept.groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("blk")))),
          x => x("blk")), " ").as("clean_text"))
    // left join keeps fully-boilerplate (and empty) documents in the
    // output with an empty rebuilt text
    val out = toks
      .select(col("doc_id"), nBlocks.cast("long").as("n_blocks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_blocks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_blocks") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
    hashed.unpersist(blocking = false)
    out
  }

  // =================================================================
  // Duplicated-span detection (sliding window)
  // =================================================================

  /** Every maximal duplicated token span in every document — the
    * sliding-window complement of [[dropDuplicateBlocks]]: where that pass
    * cuts documents into stride-`w` blocks (so an offset-shifted copy
    * slips through), this one hashes EVERY `w`-token window, catching a
    * copied passage at any alignment. Lee et al. 2022 do this with a
    * suffix array over the concatenated corpus; a single global suffix
    * array is inherently sequential to build, so the distributed
    * re-expression is the windowed shingle join — same duplicated-span
    * output for spans of at least `w` tokens, built entirely from
    * exchange-and-aggregate.
    *
    * A window whose hash occurs more than `maxCount` times in the corpus
    * (within- or cross-document) marks its `w` tokens as duplicated;
    * overlapping or adjacent marked windows then merge into maximal spans
    * (gaps-and-islands). Because every window has the same width, window
    * ends are monotone in starts, so a single `lag` per document decides
    * each island break — no running max. Output: one row per span,
    * `(doc_id, span_start, span_end, n_windows)` with `[span_start,
    * span_end)` in token offsets.
    *
    * Scale shape: shingling is a narrow per-doc array transform;
    * occurrence counting is one hash shuffle on the 60-bit window hash;
    * the verdict semi-join is on that same key (co-partitioned, AQE
    * reuses the exchange); the island merge is one shuffle on doc_id
    * whose per-doc sort is bounded by the doc's own duplicated-window
    * count. Both corpus-sized shuffles move BIGINT hashes, not window
    * strings. The span relation is duplicated-text-sized, not
    * corpus-sized; it is materialized eagerly so the shingle cache is
    * released deterministically (the [[Search.bm25TopKTerms]] lifetime
    * pattern). */
  def duplicateSpans(docs: DataFrame, w: Int = 8,
                     maxCount: Int = 1): DataFrame = {
    require(w > 0 && maxCount > 0)
    val hashed = windowHashes(docs, w)
      .persist() // feeds the occurrence count AND the verdict semi-join
    val dup = hashed.groupBy("h").agg(count(lit(1)).as("cnt"))
      .where(col("cnt") > maxCount)
    val out = hashed
      .join(dup.select("h"), Seq("h"), "left_semi")
      .transform(islands(w))
      .groupBy("doc_id", "island")
      .agg(min("start").cast("long").as("span_start"),
        (max("start") + w).cast("long").as("span_end"),
        count(lit(1)).as("n_windows"))
      .select("doc_id", "span_start", "span_end", "n_windows")
      .localCheckpoint(true)
    hashed.unpersist()
    out
  }

  /** Every `w`-token window of every document, as `(doc_id, start, h)`
    * with `h` the 60-bit window hash — the shared front of the
    * sliding-window dedup family. The hash runs in a primitive
    * `mapPartitions` loop so downstream shuffles move BIGINTs, never
    * window strings. */
  private def windowHashes(docs: DataFrame, w: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("toks"))
      .where(size(col("toks")) >= w)
      .select(col("doc_id"),
        posexplode(transform(
          sequence(lit(0), size(col("toks")) - w),
          i => array_join(slice(col("toks"), i + 1, lit(w)), " "))
        ).as(Seq("start", "sh")))
      .as[(Long, Int, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, st, sh) => (id, st, Dedup.md5Top60(md, sh)) }
      }.toDF("doc_id", "start", "h")
  }

  /** Gaps-and-islands labelling of marked window starts: window ends are
    * monotone in starts (fixed width), so one `lag` per document decides
    * each break. Adds an `island` column; callers group by
    * `(doc_id, island)` for span aggregates. */
  private def islands(w: Int)(marked: DataFrame): DataFrame = {
    val byDoc = Window.partitionBy("doc_id").orderBy("start")
    marked
      .withColumn("brk",
        when(col("start") > lag("start", 1).over(byDoc) + w, 1).otherwise(0))
      .withColumn("island", sum("brk").over(byDoc))
  }

  /** Remove duplicated spans, keeping ONE occurrence corpus-wide — the
    * destructive twin of [[duplicateSpans]] (detect → trim), i.e. the
    * "deduplicate exact substrings" pass of Lee et al. 2022 with
    * canonical retention. For each over-occurring window hash the
    * canonical occurrence is the global first by `(doc_id, start)` — a
    * total order, so re-runs and the oracle agree pick-for-pick; every
    * OTHER occurrence marks its `w` tokens for removal. Marked windows
    * merge into maximal spans per document, and the document's tokens
    * outside those spans survive.
    *
    * Output, one row per input document: `(doc_id, n_tokens, n_kept,
    * n_removed, clean_text)` — `clean_text` is the surviving tokens
    * space-joined (the same canonical text form
    * [[dropDuplicateBlocks]] emits).
    *
    * Scale shape: [[duplicateSpans]]'s exchanges (window-hash count +
    * co-partitioned verdict join, island merge on doc_id) plus ONE extra
    * corpus-sized narrow pass — the trim itself is a per-document
    * `filter(toks, i -> no span covers i)` against that document's own
    * span list (spans are duplicated-text-sized; a document's list is
    * bounded by its own duplicated regions). The canonical pick rides
    * the existing count aggregate as a `min(struct(doc_id, start))` —
    * map-side combinable, no extra shuffle. */
  def trimDuplicateSpans(docs: DataFrame, w: Int = 8,
                         maxCount: Int = 1): DataFrame = {
    require(w > 0 && maxCount > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val hashed = windowHashes(docs, w).persist()
    val dup = hashed.groupBy("h")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("doc_id"), col("start"))).as("canon"))
      .where(col("cnt") > maxCount)
      .select(col("h"), col("canon.doc_id").as("c_doc"),
        col("canon.start").as("c_start"))
    val spans = hashed.join(dup, "h")
      .where(!(col("doc_id") === col("c_doc") &&
        col("start") === col("c_start")))
      .select("doc_id", "start")
      .transform(islands(w))
      .groupBy("doc_id", "island")
      .agg(min("start").cast("long").as("s"),
        (max("start") + w).cast("long").as("e"))
      .groupBy("doc_id")
      .agg(collect_list(struct(col("s").as("_1"), col("e").as("_2")))
        .as("spans"))
      .localCheckpoint(true)
    hashed.unpersist()
    val noSpans = expr("cast(array() as array<struct<_1:bigint,_2:bigint>>)")
    // the trim itself: a primitive per-document loop (the repo's standard
    // replacement for interpreted HOF filters on corpus-sized relations);
    // null text tokenizes to an empty list so the typed loop stays total
    docs.select(col("doc_id"),
        coalesce(TextAnalysis.tokens(col("text")),
          expr("cast(array() as array<string>)")).as("toks"))
      .join(spans, Seq("doc_id"), "left")
      .withColumn("spans", coalesce(col("spans"), noSpans))
      .as[(Long, Seq[String], Seq[(Long, Long)])]
      .mapPartitions { it =>
        it.map { case (id, toks, spans) =>
          val n = toks.length
          val dead = new Array[Boolean](n)
          spans.foreach { case (s, e) =>
            var i = s.toInt
            while (i < e && i < n) { dead(i) = true; i += 1 }
          }
          val sb = new StringBuilder
          var kept = 0
          var i = 0
          while (i < n) {
            if (!dead(i)) {
              if (kept > 0) sb.append(' ')
              sb.append(toks(i))
              kept += 1
            }
            i += 1
          }
          (id, n.toLong, kept.toLong, (n - kept).toLong, sb.toString)
        }
      }.toDF("doc_id", "n_tokens", "n_kept", "n_removed", "clean_text")
  }

  // =================================================================
  // Token-budget sequence packing
  // =================================================================

  /** Assign every document to a training sequence of `budget` tokens:
    * documents are streamed in doc_id order within a bucket, the running
    * token total places each document, and a document belongs to the
    * sequence where it STARTS (`seq = (cumsum - n_tokens) div budget`) —
    * the contiguous-concatenation packing an LLM data loader performs,
    * where a document may straddle a sequence boundary. Exactly
    * window-expressible, hence one shuffle and cross-engine exact —
    * unlike first-fit bin packing, which is inherently sequential per
    * bin set and engine-dependent in tie order.
    *
    * `buckets` bounds the sequential extent: each bucket is an
    * independent packing stream, so parallelism = buckets regardless of
    * corpus size. At fleet scale pass buckets ~ O(cores in the cluster);
    * each stream's window is a single sort-merge pass. */
  def packSequences(docs: DataFrame, budget: Long = 256L,
                    buckets: Int = 8): DataFrame = {
    val win = Window.partitionBy("bucket").orderBy("doc_id")
    docs
      .select(col("doc_id"),
        pmod(col("doc_id"), lit(buckets.toLong)).as("bucket"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum("n_tokens").over(win))
      // `div`/`%`, not `/`: Column./ is DOUBLE division
      .withColumn("seq", expr(s"(cum_tokens - n_tokens) div $budget"))
      .withColumn("seq_offset", expr(s"(cum_tokens - n_tokens) % $budget"))
      .select("doc_id", "bucket", "n_tokens", "seq", "seq_offset")
  }

  // =================================================================
  // Deterministic epoch shuffle / shard assignment
  // =================================================================

  /** Deterministic global shuffle for training order: every id is keyed by
    * `md5(id ':' epoch)`, sharded by the key's high 32 bits, and ranked
    * within its shard by the full key — the (shard, pos) pair is a
    * reproducible pseudo-random permutation of the corpus that changes
    * completely from one epoch to the next (md5 avalanche) and is stable
    * across runs, partitionings, and engines (md5 is engine-independent;
    * an `xxhash64`/`rand`-seeded order would not survive an oracle
    * re-derivation). This is the data-loader primitive: epoch N's reader
    * for shard S scans its rows in `pos` order, no coordination needed.
    *
    * Scale shape: ONE shuffle, on the shard id; each shard sorts locally
    * (no global sort — a total order across 100 TB is never materialized).
    * Parallelism is capped at `nShards`, so size shards to the fleet:
    * 10k shards over 100 TB is 10 GB per sort task, and any reader
    * count <= nShards load-balances by taking shards round-robin. */
  def epochShuffle(df: DataFrame, idCol: Column, epoch: Int,
                   nShards: Int): DataFrame = {
    require(nShards > 0, s"nShards must be positive, got $nShards")
    val key = md5(concat(idCol.cast("string"), lit(":"), lit(epoch.toString)))
    val win = Window.partitionBy("shard").orderBy("shuffle_key", "id")
    df
      .select(idCol.cast("long").as("id"), key.as("shuffle_key"))
      // conv() parses the 8-hex-char prefix as an unsigned 32-bit value
      // (always < 2^32, so the BIGINT cast and the % are exact)
      .withColumn("shard",
        expr(s"cast(conv(substring(shuffle_key, 1, 8), 16, 10) as bigint) % $nShards"))
      .withColumn("pos", row_number().over(win).cast("long"))
      .select("id", "shard", "pos", "shuffle_key")
  }

  // =================================================================
  // Curation-funnel retention report
  // =================================================================

  /** Stage-by-stage retention report for a curation funnel: how many
    * documents and tokens survive each filter stage, as counts and as
    * basis points of the raw corpus. Every pipeline run wants this
    * observability row ("dedup dropped 18% of docs, 31% of tokens").
    *
    * Stages are boolean columns over ONE per-document flags relation, so
    * the whole report is a single pass: one grouping-key-free aggregate
    * computes every stage's conditional (count, token-sum) pair as a
    * partition-local fold, and the k-stage output is an unpivot of the
    * resulting single row. k stages over 100 TB must not cost k corpus
    * scans — and a keyless aggregate sorts and shuffles nothing.
    *
    * Stage conditions are expected to be nested (each implying the
    * previous) for funnel reading, though nothing enforces it. Stage 0
    * is the denominator and must match at least one row.
    *
    * @return (stage_idx, stage, n_docs, total_tokens, docs_bp, tokens_bp)
    */
  /** Unicode/whitespace text normalization — the standard pre-dedup
    * cleanup stage (C4/Dolma lineage): control characters stripped, curly
    * quotes and long dashes mapped to ASCII, NBSP to space, whitespace
    * runs collapsed, ends trimmed. Applied BEFORE fingerprinting so
    * cosmetic variants of the same content dedup together.
    *
    * A pure narrow projection of codegen'd regexp_replace chains — no
    * shuffle, linear scan at any corpus size; every pattern is RE2-safe
    * so the DuckDB oracle replays the identical chain. */
  def normalizeText(docs: DataFrame): DataFrame = {
    val t1 = regexp_replace(col("text"), "[\\x00-\\x1f\\x7f]", " ")
    val t2 = regexp_replace(t1, "[‘’]", "'")
    val t3 = regexp_replace(t2, "[“”]", "\"")
    val t4 = regexp_replace(t3, "[–—]", "-")
    val t5 = regexp_replace(t4, " ", " ")
    val t6 = trim(regexp_replace(t5, "\\s+", " "))
    docs.select(col("doc_id"),
        length(col("text")).cast("long").as("n_chars_raw"),
        t6.as("norm_text"))
      .withColumn("n_chars_norm", length(col("norm_text")).cast("long"))
  }

  /** Order-independent per-slice corpus checksum — the ingest/backfill
    * validation primitive: two corpus copies (a re-run, a migrated
    * cluster, a restored backup) are byte-equivalent on (key, payload)
    * iff their checksum relations are equal, regardless of row order or
    * partitioning.
    *
    * The combining operation is XOR of salted 60-bit key/payload hashes —
    * commutative/associative like a sum but overflow-free at ANY row
    * count (a sum of 2^60-sized hashes overflows BIGINT past ~10^4 rows
    * per slice and Spark's wrap vs DuckDB's HUGEINT promotion would then
    * disagree; XOR never leaves 60 bits). XOR's known blind spot — a row
    * duplicated an even number of times cancels out — is covered by the
    * exact row count and char sum traveling alongside.
    *
    * Shape: ONE narrow hash projection + one aggregate with map-side
    * partial XOR; the exchange moves slices x partitions partial rows. */
  def corpusChecksum(df: DataFrame, slice: Column, key: Column,
                     payload: Column): DataFrame =
    df.select(slice.as("slice"),
        Dedup.hash60(key.cast("string")).as("kh"),
        Dedup.hash60(payload.cast("string")).as("ph"),
        length(payload.cast("string")).cast("long").as("n_chars"))
      .groupBy("slice")
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(kh)").as("key_checksum"),
        expr("bit_xor(ph)").as("payload_checksum"),
        sum("n_chars").as("n_chars"))

  /** Power-of-2 token-length buckets with padding-waste accounting — the
    * batch-shaping report for training/inference: a batch pads every
    * sequence to its bucket's upper bound, so `waste_micros` is the exact
    * fraction of padded positions a length-bucketed batcher pays per
    * bucket. The bucket bound is found by integer doubling (no float
    * log2, whose rounding at exact powers is not portable).
    *
    * One narrow projection + one tiny aggregate; `maxBucket` caps the
    * CASE chain, everything longer lands in the top bucket. */
  def lengthBuckets(docs: DataFrame, lengthCol: Column,
                    minBucket: Long = 16L,
                    maxBucket: Long = 4096L): DataFrame = {
    require(minBucket > 0 && maxBucket >= minBucket)
    val bounds = Iterator.iterate(minBucket)(_ * 2)
      .takeWhile(_ <= maxBucket).toSeq
    val n = lengthCol.cast("long")
    val hi = bounds.init.foldRight(lit(bounds.last): Column) {
      (b, acc) => when(n <= b, lit(b)).otherwise(acc)
    }
    docs.select(n.as("n_tokens"), hi.as("bucket_hi"))
      .groupBy("bucket_hi")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_tokens").as("sum_tokens"),
        sum(least(col("n_tokens"), col("bucket_hi"))).as("sum_padded_base"))
      .select(col("bucket_hi"), col("n_docs"), col("sum_tokens"),
        (col("n_docs") * col("bucket_hi")).as("padded_tokens"),
        expr("(n_docs * bucket_hi - sum_padded_base) * 1000000" +
          " div (n_docs * bucket_hi)").as("waste_micros"))
  }

  def retentionReport(docs: DataFrame, tokensCol: Column,
      stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "at least one stage")
    require(stages.forall(!_._1.contains("'")), "stage names must be quote-free")
    val aggs = stages.zipWithIndex.flatMap { case ((_, cond), i) =>
      Seq(sum(when(cond, lit(1L)).otherwise(0L)).as(s"d$i"),
        sum(when(cond, tokensCol).otherwise(0L)).as(s"t$i"))
    }
    val one = docs.agg(aggs.head, aggs.tail: _*)
    val rows = stages.zipWithIndex.map { case ((name, _), i) =>
      s"CAST($i AS BIGINT), '$name', d$i, t$i, " +
        s"d$i * 10000 div d0, t$i * 10000 div t0"
    }.mkString(", ")
    one.selectExpr(s"stack(${stages.size}, $rows) AS " +
      "(stage_idx, stage, n_docs, total_tokens, docs_bp, tokens_bp)")
  }
}
