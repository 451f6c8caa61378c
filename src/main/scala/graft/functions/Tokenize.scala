package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: maximal runs of `[a-z0-9]` in a string —
  * bit-identical to `regexp_extract_all(s, '[a-z0-9]+', 0)` (the engine's
  * tokenizer applies it to `lower(text)`; lowercasing stays with Spark's
  * own `Lower`, so no case-mapping behavior is re-implemented here), but
  * as a single byte scan instead of a java.util.regex NFA walk over a
  * per-row UTF-16 `String` copy.
  *
  * Equivalence argument (TokenizeSpec pins it empirically, Unicode edge
  * cases included): `[a-z0-9]+` extracts maximal runs of those ASCII
  * characters, and in UTF-8 every non-ASCII code point encodes to bytes
  * >= 0x80 only, so a byte-level scan finds exactly the runs the regex
  * finds over the decoded `String` (UTF-16 surrogates are non-ASCII code
  * units and never match the class).
  *
  * The tokens are zero-copy slices of the input's byte array
  * (`UTF8String.fromBytes(bytes, start, len)`) — one small allocation per
  * token versus the regex path's matcher + per-match `String` + UTF8String
  * re-encode. Codegen delegates to the static scanner, so the expression
  * participates in whole-stage codegen like any built-in.
  */
case class Tokenize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.sql}")
  }

  // containsNull = true: matches regexp_extract_all's declared type, so
  // swapping the implementations never changes a downstream schema.
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "graft_tokens"

  override def nullSafeEval(s: Any): Any =
    Tokenize.tokenize(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize.tokenize($c)")

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

object Tokenize {

  /** Maximal runs of [a-z0-9] — see the class doc for the equivalence
    * argument. Static so generated code can call it directly. */
  def tokenize(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // underlying array when it spans it, else one copy
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    var start = -1
    while (i < n) {
      val b = bytes(i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (isTok) { if (start < 0) start = i }
      else if (start >= 0) {
        out.add(UTF8String.fromBytes(bytes, start, i - start))
        start = -1
      }
      i += 1
    }
    if (start >= 0) out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray)
  }
}
