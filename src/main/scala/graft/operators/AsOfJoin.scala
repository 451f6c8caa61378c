package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, attach the payload of the *latest* right
  * row with the same key and `rightTs <= leftTs` (left-outer: unmatched
  * left rows keep null payloads).
  *
  * Spark has no native as-of join. The usual compositions are a range join
  * (quadratic blow-up between key-partners) or a per-row broadcast probe
  * (driver-bound). This one is the scale shape: tag both sides, union, and
  * take a running `last(ignoreNulls)` over a (key, ts, side)-ordered
  * window — the data shuffles ONCE on the key, the window is a single
  * pass, and row count is |left| + |right|, never |left| x |right|.
  *
  * The payload travels as ONE struct per right row, so (a) a matched right
  * row whose payload *values* are NULL is still the match (the struct
  * itself is non-null — no leaking of an older non-null value), and (b)
  * with multiple payload columns the output never mixes values from
  * different right rows. Both match DuckDB `ASOF JOIN ... ON r.ts <= l.ts`,
  * which the correctness oracle uses verbatim.
  *
  * Tie rule: at equal timestamps the right row sorts before the left row
  * (side 0 < 1), so a same-instant right payload is visible.
  *
  * Requirements: right rows unique per (keys, rightTs) — pre-aggregate
  * otherwise (ambiguous ties have no portable semantics); payload column
  * names must not collide with left columns.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val pType = StructType(payload.map(p => right.schema(p)))
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
      .select(leftCols.map(col) ++ Seq(col("__ts"), col("__side"), col("__p")): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .withColumn("__p", struct(payload.map(col): _*))
      .select(leftCols.map(c => if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(col("__ts"), col("__side"), col("__p")): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__m", last(col("__p"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col("__m").getField(p).as(p)): _*)
  }
}
