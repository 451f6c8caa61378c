package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Shared HyperLogLog primitives for [[LongHllAgg]] / [[HllMergeAgg]] /
  * [[HllRegisters]] / [[HllEstimate]] — the distinct-count member of the
  * sketch tier (bloom: membership, count-min: frequency, top-k: heavy
  * keys, HLL: cardinality).
  *
  * Blob layout (big-endian): `int p | 2^p register bytes`. A value hashes
  * through [[hash31]]; the low `p` bits pick the register, the remaining
  * `B = 31-p` bits drive `rho` = leading-zero rank (`B - bitlen(w) + 1`,
  * `B+1` when the field is zero), and each register keeps the max rho
  * seen — Flajolet et al.'s HLL with the classic small-range
  * linear-counting correction in [[estimate]].
  *
  * The hash is a 31-bit xorshift-multiply finalizer (MurmurHash3-fmix
  * adapted to the 2^31 domain), NOT the pure affine map the count-min
  * sketch uses: a plain affine map is fine for CMS cells (only the
  * bucket distribution matters) but fatal for HLL, whose rho needs the
  * HIGH bits of structured inputs randomized — measured on arithmetic-
  * progression ids, the affine map overestimates 30%+ while this mix
  * stays inside the 1.04/sqrt(m) band. Every step (mod-2^31 multiply,
  * xor, right shift) is still exact in plain BIGINT SQL, so the
  * correctness gate pins every REGISTER byte cross-engine, not just an
  * error band — the same oracle-exactness discipline as [[LongCms]].
  *
  * Registers merge by elementwise max — commutative, associative AND
  * idempotent, so sketches built under any partitioning, or merged from
  * overlapping shards, are byte-identical: per-shard daily sketches can
  * be stored and re-merged forever without rescanning the corpus, which
  * is the whole point at 100 TB (distinct-users-per-anything becomes a
  * 2^p-byte blob per group, not a key-cardinality shuffle).
  */
object LongHll {
  val HeaderBytes = 4
  val MinP = 4
  val MaxP = 14

  def m(p: Int): Int = 1 << p

  /** 31-bit xorshift-multiply mix; all products < 2^62 (BIGINT-exact). */
  def hash31(v: Long): Long = {
    var h = java.lang.Math.floorMod(v, LongCms.Mod31)
    h = (h * 1103515245L + 12345L) % LongCms.Mod31
    h ^= h >>> 16
    h = (h * 32452843L) % LongCms.Mod31
    h ^= h >>> 13
    h = (h * 49979687L) % LongCms.Mod31
    h ^= h >>> 16
    h
  }

  /** rho of the (31-p)-bit field `w`: leading-zero rank, 1-based. */
  def rho(w: Long, p: Int): Int = {
    val bits = 31 - p
    if (w == 0L) bits + 1
    else bits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
  }

  def insert(regs: Array[Byte], p: Int, v: Long): Unit = {
    val h = hash31(v)
    val bucket = (h & (m(p) - 1)).toInt
    val r = rho(h >>> p, p)
    if (r > regs(bucket)) regs(bucket) = r.toByte
  }

  def serialize(regs: Array[Byte], p: Int): Array[Byte] = {
    val out = new Array[Byte](HeaderBytes + regs.length)
    out(0) = (p >>> 24).toByte; out(1) = (p >>> 16).toByte
    out(2) = (p >>> 8).toByte; out(3) = p.toByte
    System.arraycopy(regs, 0, out, HeaderBytes, regs.length)
    out
  }

  /** Validates the self-described layout; returns p. A truncated or
    * foreign BINARY must fail cleanly, not corrupt a merge. */
  def validate(blob: Array[Byte], who: String): Int = {
    if (blob.length < HeaderBytes)
      throw new IllegalArgumentException(
        s"$who: blob of ${blob.length} bytes is shorter than the " +
          s"$HeaderBytes-byte p header — not a graft_hll_agg sketch")
    val p = ((blob(0) & 0xff) << 24) | ((blob(1) & 0xff) << 16) |
      ((blob(2) & 0xff) << 8) | (blob(3) & 0xff)
    if (p < MinP || p > MaxP || blob.length != HeaderBytes + m(p))
      throw new IllegalArgumentException(
        s"$who: blob declares p=$p (needs ${HeaderBytes + m(p)} bytes) " +
          s"but holds ${blob.length} bytes — truncated or not a " +
          "graft_hll_agg sketch")
    p
  }

  /** Standard HLL estimate with the small-range linear-counting
    * correction, rounded to BIGINT. Deterministic in the blob bytes. */
  def estimate(blob: Array[Byte]): Long = {
    val p = validate(blob, "graft_hll_estimate")
    val mm = m(p)
    var z = 0.0; var zeros = 0; var i = 0
    while (i < mm) {
      val r = blob(HeaderBytes + i) & 0xff
      z += java.lang.Math.pow(2.0, -r)
      if (r == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / mm)
    val e = alpha * mm * mm / z
    val corrected =
      if (e <= 2.5 * mm && zeros > 0) mm * math.log(mm.toDouble / zeros)
      else e
    math.round(corrected)
  }

  /** Register bytes as an INT array (for explode-style auditing and the
    * exact cross-engine oracle). */
  def registers(blob: Array[Byte]): GenericArrayData = {
    val p = validate(blob, "graft_hll_registers")
    val mm = m(p)
    val out = new Array[Int](mm)
    var i = 0
    while (i < mm) { out(i) = blob(HeaderBytes + i) & 0xff; i += 1 }
    new GenericArrayData(out)
  }

  /** Elementwise-max merge of `src` blob into `dst` registers. */
  def mergeInto(dst: Array[Byte], src: Array[Byte], pExpected: Int,
                who: String): Unit = {
    val p = validate(src, who)
    if (p != pExpected)
      throw new IllegalArgumentException(
        s"$who: cannot merge sketches of different precision " +
          s"(p=$pExpected vs p=$p)")
    var i = 0
    while (i < dst.length) {
      val s = src(HeaderBytes + i)
      if (s > dst(i)) dst(i) = s
      i += 1
    }
  }
}

/** Native HyperLogLog aggregate: `graft_hll_agg(value, p)` sketches the
  * distinct count of a BIGINT column into a `2^p`-byte BINARY blob.
  * Map-side partial merge by register max; per-partition state is 2^p
  * bytes regardless of key cardinality. */
case class LongHllAgg(left: Expression, right: Expression,
                      mutableAggBufferOffset: Int = 0,
                      inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with BinaryLike[Expression] {

  private lazy val p: Int = right.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT value column, got ${left.dataType.sql}")
    else if (right.dataType != IntegerType || !right.foldable || right.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable non-null INT p, got ${right.sql}")
    else if (p < LongHll.MinP || p > LongHll.MaxP)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ${LongHll.MinP} <= p <= ${LongHll.MaxP}, got $p")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_agg"

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](LongHll.m(p))

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = left.eval(input)
    if (v != null) LongHll.insert(buffer, p, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buffer.length) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any =
    LongHll.serialize(buffer, p)

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): LongHllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongHllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongHllAgg =
    copy(left = newLeft, right = newRight)
}

/** Sketch-of-sketches: `graft_hll_merge(blob)` re-aggregates stored
  * [[LongHllAgg]] blobs (per-day / per-shard sketches) by register max —
  * the incremental path that answers "distinct over any union of slices"
  * without rescanning them. Byte-identical to sketching the union
  * directly (max is idempotent). Returns NULL for an empty group. */
case class HllMergeAgg(child: Expression,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY sketch column, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_hll_merge"

  // buffer = full blob (header + registers); empty until the first input
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer
    else {
      val blob = v.asInstanceOf[Array[Byte]]
      if (buffer.isEmpty) blob.clone()
      else {
        val p = LongHll.validate(buffer, prettyName)
        val regs = java.util.Arrays.copyOfRange(
          buffer, LongHll.HeaderBytes, buffer.length)
        LongHll.mergeInto(regs, blob, p, prettyName)
        LongHll.serialize(regs, p)
      }
    }
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    if (other.isEmpty) buffer
    else if (buffer.isEmpty) other
    else {
      val p = LongHll.validate(buffer, prettyName)
      val regs = java.util.Arrays.copyOfRange(
        buffer, LongHll.HeaderBytes, buffer.length)
      LongHll.mergeInto(regs, other, p, prettyName)
      LongHll.serialize(regs, p)
    }

  override def eval(buffer: Array[Byte]): Any =
    if (buffer.isEmpty) null else buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** `graft_hll_estimate(blob)` — the cardinality estimate off a stored
  * sketch, with the standard small-range correction. Static call inside
  * whole-stage codegen. */
case class HllEstimate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY sketch, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_estimate"

  override def nullSafeEval(blob: Any): Any =
    LongHll.estimate(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, blob =>
      s"graft.functions.LongHll.estimate($blob)")

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

/** `graft_hll_registers(blob)` — the raw register bytes as ARRAY<INT>,
  * for explode-style audits and the exact cross-engine oracle. */
case class HllRegisters(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BINARY sketch, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_hll_registers"

  override def nullSafeEval(blob: Any): Any =
    LongHll.registers(blob.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, blob =>
      s"graft.functions.LongHll.registers($blob)")

  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)
}
