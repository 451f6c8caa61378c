package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.TextAnalysis

/** Pins [[graft.functions.Tokenize]] (the native byte-scan tokenizer
  * behind `TextAnalysis.tokens`) bit-identical to the declarative regex
  * spelling it replaced — the oracle-shared contract every text operator
  * and the DuckDB rederivations depend on. */
class TokenizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val corpus = Seq(
    "The quick brown Fox jumps over 42 lazy dogs",
    "",                        // no tokens -> empty array
    "   \t\n  ",               // whitespace only
    "a",                       // single 1-char token
    "A",                       // lowercased single token
    "123abc456",               // one maximal mixed run
    "foo--bar__baz..qux",      // punctuation separators
    "über Straße çöğüş",       // non-ASCII letters stay out of [a-z0-9]
    "K elvin and İstanbul", // KELVIN SIGN -> 'k', dotted I -> i + combining dot
    "emoji 😀 mid token7end", // surrogate pair splits runs
    "ＡＢＣ ﬁ ﬂ",              // fullwidth + ligature lowercase mappings
    "trailing token9",         // run ends at end-of-string
    "9starts and ends0",
    "mixed nbsp—dash",
    "ÅNGSTRÖM unit vs Å sign")

  test("native tokens == regexp_extract_all(lower(text), '[a-z0-9]+')") {
    val df = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val rows = df.select(col("id"),
        TextAnalysis.tokens(col("text")).as("native"),
        TextAnalysis.tokensRegex(col("text")).as("regex"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"id=${r.getLong(0)}")
    }
  }

  test("null text yields null, matching the regex path") {
    val df = Seq((1L, null: String), (2L, "ok")).toDF("id", "text")
    val rows = df.select(col("id"),
        TextAnalysis.tokens(col("text")).as("native"),
        TextAnalysis.tokensRegex(col("text")).as("regex"))
      .orderBy("id").collect()
    assert(rows(0).isNullAt(1) && rows(0).isNullAt(2))
    assert(rows(1).getSeq[String](1) == Seq("ok"))
  }

  test("agreement holds under the interpreted (non-codegen) path too") {
    // eval path: construct rows where codegen is bypassed via a literal
    val r = spark.sql(
      "SELECT graft_tokens(lower('Ab9 ,x YZ')) AS t").head()
    assert(r.getSeq[String](0) == Seq("ab9", "x", "yz"))
    assert(spark.catalog.functionExists("graft_tokens"))
  }

  test("tokenCount == size(tokens) on the edge-case corpus, nulls included") {
    val df = (corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) } :+
        (999L, null: String))
      .toDF("id", "text")
    val rows = df.select(col("id"),
        TextAnalysis.tokenCount(col("text")).as("cnt"),
        size(TextAnalysis.tokens(col("text"))).as("sz"))
      .collect()
    rows.foreach { r =>
      if (r.isNullAt(1) || r.isNullAt(2))
        assert(r.isNullAt(1) && r.isNullAt(2), s"id=${r.getLong(0)}")
      else assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}")
    }
  }

  test("tokenCount == size(tokens) on the sf0.001 documents corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = docs.select(
        TextAnalysis.tokenCount(col("text")).as("cnt"),
        size(TextAnalysis.tokens(col("text"))).as("sz"))
      .where(not(col("cnt") <=> col("sz")))
      .count()
    assert(bad == 0L)
  }

  test("agreement on the sf0.001 documents corpus end to end") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val bad = docs.select(
        TextAnalysis.tokens(col("text")).as("native"),
        TextAnalysis.tokensRegex(col("text")).as("regex"))
      .where(not(col("native") <=> col("regex")))
      .count()
    assert(bad == 0L)
  }
}
