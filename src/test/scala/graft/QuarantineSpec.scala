package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.Quarantine

/** Malformed-JSONL quarantine: the split must be lossless (every line on
  * exactly one side), syntactic corruption must quarantine, and schema
  * drift (missing/null fields) must NOT — drift is data. */
class QuarantineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("lang", StringType)))

  private val fixture = Seq(
    (1L, """{"id": 1, "lang": "en"}"""),   // clean
    (2L, """{"id": 2, "lang": "e"""),      // truncated mid-string
    (3L, """{"id": 3}"""),                 // valid, lang missing -> drift
    (4L, """not json at all"""),           // garbage
    (5L, """{"id": 5, "lang": null}"""),   // explicit null -> drift
    (6L, """{"id": 6, "lang": "de"}   """),// trailing whitespace ok
    (7L, """{"id": 7 "lang": "fr"}"""),    // missing comma
    (8L, """"""))                          // empty line
    .toDF("line_no", "line")

  test("split is lossless and flags exactly the syntactically broken lines") {
    val ann = Quarantine.split(fixture, "line", schema)
    val flags = ann.collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("quarantined"))).toMap
    assert(flags == Map(1L -> false, 2L -> true, 3L -> false, 4L -> true,
      5L -> false, 6L -> false, 7L -> true, 8L -> true))
    assert(ann.count() == 8) // nothing dropped
  }

  test("good side flattens the schema; bad side preserves lines verbatim") {
    val good = Quarantine.good(fixture, "line", schema).collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    assert(good == Set((1L, 1L, Some("en")), (3L, 3L, None),
      (5L, 5L, None), (6L, 6L, Some("de"))))
    val bad = Quarantine.bad(fixture, "line", schema).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(bad == Set((2L, """{"id": 2, "lang": "e"""),
      (4L, "not json at all"), (7L, """{"id": 7 "lang": "fr"}"""), (8L, "")))
  }

  test("corrupt rows surface NO partial fields — the id that parsed " +
      "before the truncation point must not leak") {
    // {"id": 2, "lang": "e — the id token is valid JSON up to the cut;
    // the q_json_quarantine oracle depends on the parser nulling it
    val ann = Quarantine.split(fixture, "line", schema)
      .where(col("quarantined"))
      .select(col("parsed.id"), col("parsed.lang")).collect()
    assert(ann.nonEmpty)
    assert(ann.forall(r => r.isNullAt(0) && r.isNullAt(1)),
      "PERMISSIVE must null every data field of a corrupt record")
  }

  test("the split is one narrow codegen'd pass — no shuffle, no cache") {
    val plan = Quarantine.split(fixture, "line", schema)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("InMemoryTableScan"), plan)
  }
}
