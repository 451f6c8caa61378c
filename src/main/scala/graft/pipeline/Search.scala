package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus: inverted-index statistics +
  * BM25-style ranking, exact BIGINT arithmetic end to end.
  *
  * Scoring is the BM25 shape with a RATIONAL idf instead of the usual
  * logarithm: `idf = (2(N-df)+1) / (2df+1)` in integer micros — the same
  * ln-free trick as the tf-idf operator (a logarithm computed by two
  * engines' libm is not guaranteed bit-identical; a rational function of
  * BIGINTs is). The rational idf is a strictly monotone transform of the
  * Robertson idf argument `(N-df+0.5)/(df+0.5)`, so single-term rankings
  * are identical and multi-term rankings only re-weight terms relative to
  * each other (more weight to rare terms — the direction BM25 wants).
  *
  * Shape at scale: one explode + one (doc, term) aggregate builds the
  * postings (this IS the inverted index — the unavoidable shuffle); doc
  * lengths and term dfs are rollups of the postings; the query set is tiny
  * and broadcast; per-query top-k goes through a rank window that Spark
  * prunes with WindowGroupLimit on both sides of the exchange, so only
  * ~queries x k rows ever shuffle.
  */
object Search {

  /** @param docs    corpus
    * @param queries (query_id, terms) — the small search workload
    * @param k       results per query
    * @return (query_id, rk, doc_id, score_micros), rk 1..k, score-desc
    *         with doc_id tie-break
    */
  def bm25TopK(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      queries: Seq[(Long, Seq[String])],
      k: Int,
      k1Micros: Long = 1200000L,
      bMicros: Long = 750000L): DataFrame = {
    require(queries.nonEmpty && k > 0)
    val spark = docs.sparkSession
    import spark.implicits._

    // The postings relation feeds four consumers (query-term contrib, doc
    // lengths, term dfs, corpus stats); without a cache each branch
    // re-tokenizes the corpus — persist the compact (doc, term, tf)
    // relation once, released below once the top-k is materialized.
    val postings = docs
      .select(col(idCol).as("doc_id"),
        explode(TextAnalysis.tokens(col(textCol))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
      .persist()

    val dl = postings.groupBy("doc_id").agg(sum("tf").as("dl"))
    // N counts ALL docs (token-less ones score 0 but weigh on idf).
    val stats = docs.agg(count(lit(1)).as("n"))
      .crossJoin(dl.agg(sum("dl").as("sum_dl")))

    val q = queries.flatMap { case (qid, terms) => terms.map(t => (qid, t)) }
      .toDF("query_id", "term")

    // Restrict postings to query terms BEFORE any per-term statistics: df
    // of a term only depends on that term's postings, so the broadcast
    // semi-join prunes the vocabulary-sized aggregate down to |query terms|
    // (a full-vocabulary df relation is neither needed nor broadcastable
    // at corpus scale).
    val qPostings = postings
      .join(broadcast(q.select("term").distinct()), "term")
    val dft = qPostings.groupBy("term").agg(count(lit(1)).as("df"))

    val contrib = broadcast(q)
      .join(qPostings, "term")
      .join(dl, "doc_id")
      .join(broadcast(dft), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf_micros",
        expr("((2 * (n - df) + 1) * 1000000) div (2 * df + 1)"))
      .withColumn("l_ratio_micros", expr("(dl * n * 1000000) div sum_dl"))
      .withColumn("denom_micros",
        expr(s"tf * 1000000 + ($k1Micros * (1000000 - $bMicros + " +
          s"($bMicros * l_ratio_micros) div 1000000)) div 1000000"))
      .withColumn("contrib_micros",
        expr(s"(idf_micros * ((tf * (1000000 + $k1Micros) * 1000000) " +
          "div denom_micros)) div 1000000"))

    val scored = contrib.groupBy("query_id", "doc_id")
      .agg(sum("contrib_micros").as("score_micros"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score_micros").desc, col("doc_id"))
    val topk = scored
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select("query_id", "rk", "doc_id", "score_micros")
    // |queries| * k rows: materialize eagerly (cutting lineage) so the
    // corpus-sized postings cache is released deterministically instead of
    // leaking across invocations
    val out = topk.localCheckpoint(true)
    postings.unpersist()
    out
  }
}
