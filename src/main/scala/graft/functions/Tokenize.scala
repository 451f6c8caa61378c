package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
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
/** `size(Tokenize(Lower(child)))` as ONE counting byte scan — for
  * consumers that need only the token COUNT (document length, corpus
  * token totals): no lowercased row copy, no per-token slices, no array.
  *
  * Equivalence: over pure-ASCII bytes, lowercasing maps `A-Z` to `a-z`
  * 1:1 and touches nothing else, so the `[a-z0-9]` runs of `lower(s)`
  * are exactly the `[a-zA-Z0-9]` runs of `s` — counted directly. Any
  * byte >= 0x80 falls back to scanning `s.toLowerCase` (the same
  * UTF8String lowercasing `Lower` applies under the default collation),
  * so Unicode case mappings that produce ASCII letters (U+212A KELVIN
  * SIGN -> `k`, etc.) count identically to the tokenizer
  * (TokenizeSpec pins `graft_token_count == size(tokens)` empirically,
  * those edge cases included). */
case class TokenCount(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${dt.sql}")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_token_count"

  override def nullSafeEval(s: Any): Any =
    Tokenize.tokenCount(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Tokenize.tokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenCount =
    copy(child = newChild)
}

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

  /** Number of tokens [[tokenize]] would find in `s.toLowerCase` — one
    * counting pass, no copies (see [[TokenCount]] for the equivalence
    * argument; non-ASCII input falls back to the lowercase-then-scan
    * path the tokenizer itself certifies). */
  def tokenCount(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      if (b < 0) return tokenCountLowered(s.toLowerCase)
      val isTok = (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
        (b >= '0' && b <= '9')
      if (isTok) { if (!inTok) { count += 1; inTok = true } }
      else inTok = false
      i += 1
    }
    count
  }

  private def tokenCountLowered(s: UTF8String): Int = {
    val bytes = s.getBytes
    val n = bytes.length
    var count = 0
    var inTok = false
    var i = 0
    while (i < n) {
      val b = bytes(i)
      val isTok = (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
      if (isTok) { if (!inTok) { count += 1; inTok = true } }
      else inTok = false
      i += 1
    }
    count
  }
}
