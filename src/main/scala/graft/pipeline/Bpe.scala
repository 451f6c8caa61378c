package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE vocabulary induction — tokenizer merge training at
  * corpus scale (Sennrich et al., "Neural Machine Translation of Rare
  * Words with Subword Units", 2016; the counting phase of every
  * production tokenizer trainer).
  *
  * The scale design is the one that makes tokenizer training feasible on
  * 100 TB: the corpus is touched exactly once, by `wordFreq` (one
  * explode + one combine-heavy `groupBy(word)` exchange); every merge
  * iteration after that runs on the VOCABULARY relation, which is
  * orders of magnitude smaller than the corpus and independent of
  * corpus growth once the vocabulary saturates. Per iteration the plan
  * is: one map-side-combined pair-count aggregate (the only exchange),
  * a single-row argmax collect (the merge decision — 1 row, bounded by
  * construction), and a NARROW greedy re-segmentation fold over each
  * word's symbol array (a higher-order `aggregate`, zero shuffle; the
  * interpreted-HOF cost the repo avoids on corpus-sized relations is
  * fine here because the relation is vocab-sized). Each iteration ends
  * in an eager `localCheckpoint` so iteration i+1's argmax job replays
  * one iteration, not i — the PageRank iteration discipline.
  *
  * Exactness: pair counts are BIGINT sums of BIGINT word frequencies;
  * the argmax tie-break is total (count desc, then left asc, right asc),
  * so retrained merges are bit-stable and the DuckDB oracle re-derives
  * every rank's pair and count under the hash.
  *
  * Greedy merge semantics (the classic single-pass left-to-right fold):
  * scanning a word's symbols, an (l, r) adjacency merges and consumes
  * both symbols; scanning resumes AFTER the merged pair, so in a run of
  * identical symbols merges land at even offsets (`aaa` + (a,a) →
  * `[aa, a]`). A merged symbol can itself be the left or right side of a
  * later-ranked merge — that is what grows multi-character subwords.
  */
object Bpe {

  /** One learned merge: at `rank`, adjacent (`left`, `right`) became
    * `merged`, chosen because their weighted adjacency count
    * `pairCount` was maximal. */
  final case class Merge(rank: Int, left: String, right: String,
                         merged: String, pairCount: Long)

  /** The trained model: the ordered merge list (driver-side — K rows by
    * construction, the same bounded state any tokenizer ships) plus the
    * final per-word segmentation relation `(word, freq, syms)`. */
  final case class Model(merges: Seq[Merge], segmented: DataFrame)

  /** Corpus word frequencies — the single corpus-sized pass. */
  def wordFreq(docs: DataFrame, text: Column): DataFrame =
    docs.select(explode(TextAnalysis.tokens(text)).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Initial segmentation: one symbol per character. */
  private def charSyms(word: Column): Column =
    regexp_extract_all(word, lit("."), lit(0))

  /** Greedy left-to-right single-pass merge of adjacent (l, r) inside a
    * symbol array — the narrow fold at the heart of each iteration.
    * State is (acc, carry): `carry` holds the last unmerged symbol;
    * seeing `r` while carrying `l` emits the merged symbol and clears
    * the carry (so the merged symbol cannot re-merge within the same
    * pass — `merged == l` would require an empty `r`, which the
    * tokenizer never produces). */
  private def mergeFold(syms: Column, l: String, r: String): Column = {
    val emptyAcc = expr("cast(array() as array<string>)")
    val nullCarry = lit(null).cast("string")
    def flush(st: Column): Column =
      when(st.getField("carry").isNull, st.getField("acc"))
        .otherwise(array_append(st.getField("acc"), st.getField("carry")))
    aggregate(
      syms,
      struct(emptyAcc.as("acc"), nullCarry.as("carry")),
      (st, s) =>
        when(st.getField("carry") === lit(l) && s === lit(r),
          struct(array_append(st.getField("acc"), lit(l + r)).as("acc"),
            nullCarry.as("carry")))
        .otherwise(
          struct(flush(st).as("acc"), s.as("carry"))),
      st => flush(st))
  }

  /** Train up to `nMerges` merges over a `(word, freq)` vocabulary
    * relation (stop early if no adjacent pair remains). Returns the
    * merge table and the final segmentation. */
  def train(words: DataFrame, nMerges: Int): Model = {
    require(nMerges >= 1, "nMerges must be >= 1")
    var seg = words
      .select(col("word"), col("freq").cast("long").as("freq"),
        charSyms(col("word")).as("syms"))
      .localCheckpoint(true)
    val merges = Seq.newBuilder[Merge]
    var rank = 1
    var exhausted = false
    while (rank <= nMerges && !exhausted) {
      // adjacent-pair counts, weighted by word frequency: the iteration's
      // one exchange, with map-side partial sums over a vocab-sized input
      val pairs = seg.select(col("freq"),
          explode(zip_with(
            slice(col("syms"), lit(1), size(col("syms")) - 1),
            slice(col("syms"), lit(2), size(col("syms")) - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("freq").as("cnt"))
      // total-order argmax → ONE row to the driver (the merge decision)
      val best = pairs.orderBy(desc("cnt"), asc("l"), asc("r"))
        .limit(1).collect()
      if (best.isEmpty) {
        exhausted = true
      } else {
        val Row(l: String, r: String, cnt: Long) = best(0)
        merges += Merge(rank, l, r, l + r, cnt)
        // narrow re-segmentation; checkpoint so the next argmax job
        // replays one iteration of lineage, not `rank`
        seg = seg.withColumn("syms", mergeFold(col("syms"), l, r))
          .localCheckpoint(true)
        rank += 1
      }
    }
    Model(merges.result(), seg)
  }

  /** The merge table as a DataFrame (rank, left, right, merged,
    * pair_count) — what a tokenizer persists. */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.toDS().toDF("rank", "left", "right", "merged", "pair_count")
      .select(col("rank").cast("long").as("rank"), col("left"),
        col("right"), col("merged"), col("pair_count"))
  }

  /** Re-apply an ordered merge list to a `(word, ...)` relation —
    * encoding against a previously trained model. Narrow folds only;
    * lineage is cut every `checkpointEvery` merges so arbitrarily long
    * merge lists keep a bounded plan. */
  def segment(words: DataFrame, merges: Seq[Merge],
              checkpointEvery: Int = 16): DataFrame = {
    var seg = words.withColumn("syms", charSyms(col("word")))
    var applied = 0
    merges.foreach { m =>
      seg = seg.withColumn("syms", mergeFold(col("syms"), m.left, m.right))
      applied += 1
      if (applied % checkpointEvery == 0) seg = seg.localCheckpoint(true)
    }
    seg
  }

  /** Per-document encoded-token counts under a trained segmentation:
    * explode the corpus once and join each word occurrence against the
    * vocab-sized `(word, n_syms)` relation (AQE broadcasts it while it
    * fits, shuffle-joins on `word` once it is cluster-scale). Documents
    * with no tokens drop out — they encode to nothing. */
  def encodedTokens(docs: DataFrame, text: Column, keyCols: Seq[Column],
                    segmented: DataFrame): DataFrame = {
    val perWord = segmented
      .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
    docs.select(keyCols :+ explode(TextAnalysis.tokens(text)).as("word"): _*)
      .join(perWord, "word")
      .groupBy(keyCols: _*)
      .agg(count(lit(1)).as("n_words"), sum("n_syms").as("n_tokens"))
  }
}
