package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

/** Native Catalyst expression: Hilbert-curve index of two BIGINT
  * coordinates (`graft_hilbert(x, y, bits)`, each coordinate in
  * `[0, 2^bits)`).
  *
  * Why an expression and not a Column chain: the quadrant walk carries
  * (x, y, d) state through `bits` steps, each referencing x and y several
  * times. Spelled as chained projections that is 4 x bits Project layers —
  * correct, but the generated code for 31 levels blows past the
  * whole-stage-codegen method limits and the plan drops to interpreted
  * evaluation (measured: 15.5 s for 600k rows at sf0.1, ~15x the Morton
  * key). As a single expression the whole walk is ONE tight compiled loop
  * ([[graft.operators.Hilbert.index]]) invoked from generated code — the
  * custom-`Expression` tier of SURVEY §2.2's extension preference order,
  * same as [[LongArrayDot]].
  *
  * `bits` must be a foldable integer literal (checked at analysis, like
  * the sketch sizes) — it is folded into the generated code as a
  * constant.
  */
case class HilbertIndex(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != LongType || second.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two BIGINT coordinates, " +
          s"got ${first.dataType.sql} and ${second.dataType.sql}")
    else if (third.dataType != IntegerType || !third.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a literal INT bits argument")
    else if (bits < 1 || bits > 31)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs bits in [1, 31], got $bits")
    else TypeCheckResult.TypeCheckSuccess

  private lazy val bits: Int = third.eval() match {
    case i: Int => i
    case _ => -1 // null literal: rejected by the range check above
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any =
    graft.operators.Hilbert.index(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y, _) =>
      s"${ev.value} = graft.operators.Hilbert.index($x, $y, $bits);")

  override protected def withNewChildrenInternal(f: Expression, s: Expression,
      t: Expression): HilbertIndex = copy(first = f, second = s, third = t)
}
