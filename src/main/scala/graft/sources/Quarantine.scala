package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Malformed-record quarantine for newline-delimited JSON ingestion.
  *
  * A 100 TB crawl dump always contains broken rows — truncated writes,
  * encoding damage, mid-record splits. The failure modes to avoid are
  * silent drops (DROPMALFORMED loses data with no audit trail) and
  * whole-job aborts (FAILFAST turns one bad line into a dead pipeline).
  * The scale-correct shape is a SPLIT: parse what parses, keep every
  * broken line VERBATIM in a quarantine relation for re-crawl/repair,
  * and make both sides of the split first-class query inputs.
  *
  * Implementation: `from_json` over the raw line column — one narrow,
  * codegen'd pass, no caching, no second read. (The alternative,
  * `spark.read.json` with `columnNameOfCorruptRecord`, cannot filter on
  * the corrupt column without materializing the whole parse first —
  * Spark disallows referencing only the internal corrupt column — so
  * the from_json spelling is both simpler and cheaper.) Detection
  * detail: PERMISSIVE `from_json` yields a struct of all-null FIELDS
  * (not a null struct) on malformed input, indistinguishable from
  * legitimately-null data — so the corrupt-record column must ride
  * inside the parse schema, where the parser deposits the offending
  * text exactly when the line is syntactically invalid. Valid JSON
  * missing fields parses with null fields and a null corrupt column
  * (schema drift is data, not corruption — quality rules downstream
  * decide what to do with it).
  */
object Quarantine {

  private val CorruptCol = "_corrupt_record"

  /** Annotate raw JSONL lines with their parse: every column of `lines`
    * is kept, plus `parsed` (struct of `schema`, null-fielded on
    * corruption) and `quarantined` (boolean). Split with two filters;
    * no line is ever dropped. */
  def split(lines: DataFrame, lineCol: String, schema: StructType): DataFrame = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"$CorruptCol is reserved for corruption capture")
    val withCorrupt = StructType(
      schema.fields :+ StructField(CorruptCol, StringType))
    lines
      .withColumn("parsed", from_json(col(lineCol), withCorrupt,
        Map("columnNameOfCorruptRecord" -> CorruptCol)))
      .withColumn("quarantined",
        col("parsed").isNull || col(s"parsed.$CorruptCol").isNotNull)
  }

  /** The parseable side, flattened to `schema`'s columns (plus any
    * carried columns of `lines` other than the raw line). */
  def good(lines: DataFrame, lineCol: String, schema: StructType): DataFrame = {
    val carried = lines.columns.filterNot(_ == lineCol).toSeq
    split(lines, lineCol, schema)
      .where(!col("quarantined"))
      .select(carried.map(col) ++
        schema.fieldNames.toSeq.map(f => col(s"parsed.$f")): _*)
  }

  /** The quarantine side: carried columns + the offending line verbatim. */
  def bad(lines: DataFrame, lineCol: String, schema: StructType): DataFrame =
    split(lines, lineCol, schema)
      .where(col("quarantined"))
      .select(lines.columns.map(col).toIndexedSeq: _*)
}
