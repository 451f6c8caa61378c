package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, IntegerType, LongType}

/** Shared count-min-sketch primitives for [[LongCmsAgg]] / [[CmsEstimate]].
  *
  * Blob layout (big-endian): `int depth | int width | depth*width * long`.
  * Row `r` hashes a value with a 31-bit affine map
  * `h_r(v) = ((floorMod(v, 2^31) * A_r + B_r) mod 2^31) mod width` — all
  * products stay below 2^62, so the identical arithmetic runs in plain
  * BIGINT SQL (the DuckDB oracle re-derives every counter), unlike a
  * murmur-mixed hash. Counters merge by elementwise sum, which is
  * commutative/associative, so sketches built under any partitioning are
  * byte-identical — estimates are deterministic, not merely bounded.
  *
  * Estimate = min over rows of the value's counter: never below the true
  * count, above it only through collisions (within `e*N/width` with
  * probability `1 - e^-depth` — the standard CM bound).
  */
object LongCms {
  val HeaderBytes = 8
  val MaxDepth = 8
  val Mod31 = 2147483648L // 2^31

  // odd 31-bit primes: multipliers and offsets for up to MaxDepth rows
  val A: Array[Long] = Array(1103515245L, 1299709L, 15485863L, 32452843L,
    49979687L, 67867967L, 86028121L, 104395301L)
  val B: Array[Long] = Array(12345L, 7919L, 104729L, 1299721L,
    15485867L, 32452867L, 49979693L, 67867979L)

  def cell(r: Int, value: Long, width: Int): Int =
    (((java.lang.Math.floorMod(value, Mod31) * A(r) + B(r)) % Mod31) %
      width).toInt

  def insert(counters: Array[Long], depth: Int, width: Int, value: Long): Unit = {
    var r = 0
    while (r < depth) {
      counters(r * width + cell(r, value, width)) += 1L
      r += 1
    }
  }

  def serialize(counters: Array[Long], depth: Int, width: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HeaderBytes + 8 * counters.length)
    bb.putInt(depth).putInt(width)
    counters.foreach(bb.putLong)
    bb.array()
  }

  def deserializeCounters(blob: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    bb.getInt; val width = bb.getInt
    val n = (blob.length - HeaderBytes) / 8
    val _ = width
    Array.fill(n)(bb.getLong)
  }

  private def readIntBE(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
      ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)

  private def readLongBE(b: Array[Byte], o: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(o + i) & 0xffL); i += 1 }
    v
  }

  /** Validate a blob's self-described layout against its actual length —
    * a truncated or foreign BINARY input must fail with a clean error,
    * not an ArrayIndexOutOfBoundsException from inside codegen. Returns
    * (depth, width). */
  def validate(blob: Array[Byte], fn: String): (Int, Int) = {
    if (blob.length < HeaderBytes)
      throw new IllegalArgumentException(
        s"$fn: blob of ${blob.length} bytes is shorter than " +
          s"the $HeaderBytes-byte (depth, width) header — not a graft_cms_agg sketch")
    val depth = readIntBE(blob, 0)
    val width = readIntBE(blob, 4)
    if (depth < 1 || depth > MaxDepth || width < 2 || width > (1 << 22) ||
        blob.length < HeaderBytes + 8L * depth * width)
      throw new IllegalArgumentException(
        s"$fn: blob declares depth=$depth width=$width " +
          s"(needs ${HeaderBytes + 8L * depth * width} bytes) but holds " +
          s"${blob.length} bytes — truncated or not a graft_cms_agg sketch")
    (depth, width)
  }

  /** Point estimate straight off the serialized blob (called per row from
    * codegen; no buffer materialization). */
  def estimate(blob: Array[Byte], value: Long): Long = {
    val (depth, width) = validate(blob, "graft_cms_estimate")
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val c = readLongBE(blob,
        HeaderBytes + 8 * (r * width + cell(r, value, width)))
      if (c < best) best = c
      r += 1
    }
    best
  }

  /** Sketch inner product — the classic CM join-cardinality estimator
    * (Cormode & Muthukrishnan §4.3): `min over rows r of
    * sum_w a_r[w] * b_r[w]` upper-bounds (and concentrates around) the
    * equi-join size `sum_key f_a(key) * f_b(key)`; never an
    * undercount, since every true pair lands in the same cell of every
    * row. Both sketches must share (depth, width) — and therefore hash
    * seeds, which are fixed per row index. */
  def innerProduct(a: Array[Byte], b: Array[Byte]): Long = {
    val (da, wa) = validate(a, "graft_cms_dot")
    val (db, wb) = validate(b, "graft_cms_dot")
    if (da != db || wa != wb)
      throw new IllegalArgumentException(
        s"graft_cms_dot: sketch shapes differ — ($da x $wa) vs ($db x $wb); " +
          "join-size estimation needs both sides aggregated with the same " +
          "graft_cms_agg(_, depth, width)")
    var best = Long.MaxValue
    var r = 0
    while (r < da) {
      var dot = 0L
      var w = 0
      while (w < wa) {
        val off = HeaderBytes + 8 * (r * wa + w)
        dot += readLongBE(a, off) * readLongBE(b, off)
        w += 1
      }
      if (dot < best) best = dot
      r += 1
    }
    best
  }
}

/** Native count-min-sketch aggregate:
  * `graft_cms_agg(value, depth, width)` builds a frequency sketch over a
  * BIGINT column and returns it as BINARY.
  *
  * The sketch tier for heavy-hitter/frequency estimation at corpus scale:
  * an exact per-key count needs a key-cardinality-sized shuffle, while the
  * sketch is `depth*width` longs per PARTITION (map-side partial merge by
  * elementwise sum) regardless of key cardinality — pair with a candidate
  * set (graft_topk, a known watchlist) probed via [[CmsEstimate]].
  */
case class LongCmsAgg(first: Expression, second: Expression, third: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with TernaryLike[Expression] {

  private lazy val depth: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val width: Int = third.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT value column, got ${first.dataType.sql}")
    else if (second.dataType != IntegerType || !second.foldable || second.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable non-null INT depth, got ${second.sql}")
    else if (depth < 1 || depth > LongCms.MaxDepth)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= depth <= ${LongCms.MaxDepth}, got $depth")
    else if (third.dataType != IntegerType || !third.foldable || third.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable non-null INT width, got ${third.sql}")
    else if (width < 2 || width > (1 << 22))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 2 <= width <= 2^22, got $width")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_cms_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) LongCms.insert(buffer, depth, width, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) += other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    LongCms.serialize(buffer, depth, width)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    LongCms.serialize(buffer, depth, width)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    LongCms.deserializeCounters(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): LongCmsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongCmsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LongCmsAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native point-frequency probe: `graft_cms_estimate(blob, value)` reads a
  * [[LongCmsAgg]] blob and returns the min-counter estimate — never below
  * the true count. Compiles to a static call inside whole-stage codegen. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY blob, BIGINT value), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_estimate"

  override def nullSafeEval(blob: Any, v: Any): Any =
    LongCms.estimate(blob.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, v) =>
      s"${ev.value} = graft.functions.LongCms.estimate($blob, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd sketch inner product `graft_cms_dot(a, b)` — equi-join
  * cardinality estimation from two same-shape count-min sketches (see
  * [[LongCms.innerProduct]]): plan-time sizing for join strategy choices
  * (broadcast vs shuffle, salting) without touching either input again.
  */
case class CmsInnerProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two BINARY graft_cms_agg sketches, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cms_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    LongCms.innerProduct(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.LongCms.innerProduct($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsInnerProduct =
    copy(left = newLeft, right = newRight)
}
