package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, attach the payload of the *latest* right
  * row with the same key and `rightTs <= leftTs` (left-outer: unmatched
  * left rows keep null payloads).
  *
  * Spark has no native as-of join. The usual compositions are a range join
  * (quadratic blow-up between key-partners) or a per-row broadcast probe
  * (driver-bound). This one is the scale shape: tag both sides, union, and
  * take a running `last(payload, ignoreNulls)` over a
  * (key, ts, side)-ordered window — the data shuffles ONCE on the key, the
  * window is a single pass, and row count is |left| + |right|, never
  * |left| x |right|.
  *
  * Tie rule: at equal timestamps the right row sorts before the left row
  * (side 0 < 1), so a same-instant right payload is visible — matching
  * DuckDB `ASOF JOIN ... ON r.ts <= l.ts` semantics, which the correctness
  * oracle uses verbatim.
  *
  * Requirements: right rows unique per (keys, rightTs) — pre-aggregate
  * otherwise (ambiguous ties have no portable semantics); payload column
  * names must not collide with left columns.
  */
object AsOfJoin {

  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val l = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__ts") :+ col("__side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType).as(p)): _*)
    val r = right
      .withColumn("__ts", col(rightTs))
      .withColumn("__side", lit(0))
      .select((leftCols.map(c => if (keys.contains(c)) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__ts") :+ col("__side")) ++ payload.map(col): _*)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((leftCols.map(col) :+ col("__side")) ++
        payload.map(p => last(col(p), ignoreNulls = true).over(w).as(p)): _*)
      .where(col("__side") === 1)
      .drop("__side")
  }
}
