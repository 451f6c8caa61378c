package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.TernaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, IntegerType, LongType}

/** Shared Bloom-filter primitives for [[LongBloomAgg]] / [[BloomMightContain]].
  *
  * Blob layout (big-endian): `int numHashes | int numWords | numWords * long`.
  * Membership bits are derived from the 64-bit input by double hashing
  * (Kirsch–Mitzenmacher): two murmur3-finalizer mixes give `h1`, `h2`
  * (forced odd), and probe `i` tests bit `(h1 + i*h2) mod numBits`. The
  * whole construction is a pure function of the inserted value multiset —
  * filters built under any partitioning/merge order are byte-identical,
  * which the spec asserts (bitwise-OR merge is commutative/associative and
  * insertion is idempotent).
  */
object LongBloom {
  val HeaderBytes = 8
  val MaxHashes = 16

  // murmur3 fmix64 — the standard 64-bit avalanche finalizer
  def mix(v0: Long): Long = {
    var v = v0
    v ^= v >>> 33; v *= 0xff51afd7ed558ccdL
    v ^= v >>> 33; v *= 0xc4ceb9fe1a85ec53L
    v ^= v >>> 33
    v
  }

  def wordsFor(numBits: Int): Int = (numBits + 63) >>> 6

  /** Set `value`'s k bits in `words` (numBits = words.length * 64). */
  def insert(words: Array[Long], numHashes: Int, value: Long): Unit = {
    val m = words.length.toLong * 64L
    val h1 = mix(value)
    val h2 = mix(value ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < numHashes) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      words((idx >>> 6).toInt) |= 1L << (idx & 63L)
      i += 1
    }
  }

  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(HeaderBytes + 8 * words.length)
    bb.putInt(numHashes).putInt(words.length)
    words.foreach(bb.putLong)
    bb.array()
  }

  def deserializeWords(blob: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(blob)
    bb.getInt // numHashes
    val n = bb.getInt
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

  /** Membership probe straight off the serialized blob (no word-array
    * materialization — called per row from codegen). May only false-positive,
    * never false-negative, for values inserted into the same-shaped filter. */
  def contains(blob: Array[Byte], value: Long): Boolean = {
    val k = readIntBE(blob, 0)
    val m = readIntBE(blob, 4).toLong * 64L
    val h1 = mix(value)
    val h2 = mix(value ^ 0x9e3779b97f4a7c15L) | 1L
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h1 + i * h2, m)
      if ((readLongBE(blob, HeaderBytes + ((idx >>> 6) << 3).toInt) &
            (1L << (idx & 63L))) == 0L) return false
      i += 1
    }
    true
  }
}

/** Native Bloom-filter aggregate: `graft_bloom_agg(value, numBits, numHashes)`
  * builds a set-membership sketch over a BIGINT column and returns the
  * serialized filter as BINARY.
  *
  * This is the sketch tier of SURVEY §2.2's extension preference order: like
  * [[LongTopK]] it is a `TypedImperativeAggregate` with map-side partial
  * aggregation — each task fills a local bit array, partials merge by
  * bitwise OR, and only `numBits/8` bytes per partition cross the wire.
  * The intended use (see `Dedup.incrementalBloom`) is semi-join pruning:
  * sketch the SMALL side's join keys, broadcast the blob as a literal, and
  * pre-filter the 100 TB side's scan down to possible matches before the
  * real join — false positives cost a few extra rows in the join, false
  * negatives cannot occur, so the surrounding query stays exact.
  */
case class LongBloomAgg(first: Expression, second: Expression, third: Expression,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with TernaryLike[Expression] {

  private lazy val numBits: Int = second.eval().asInstanceOf[Number].intValue()
  private lazy val numHashes: Int = third.eval().asInstanceOf[Number].intValue()

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT value column, got ${first.dataType.sql}")
    else if (second.dataType != IntegerType || !second.foldable || second.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable non-null INT numBits, got ${second.sql}")
    else if (numBits < 64 || numBits > (1 << 30))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 64 <= numBits <= 2^30, got $numBits")
    else if (third.dataType != IntegerType || !third.foldable || third.eval() == null)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a foldable non-null INT numHashes, got ${third.sql}")
    else if (numHashes < 1 || numHashes > LongBloom.MaxHashes)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires 1 <= numHashes <= ${LongBloom.MaxHashes}, got $numHashes")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](LongBloom.wordsFor(numBits))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = first.eval(input)
    if (v != null) LongBloom.insert(buffer, numHashes, v.asInstanceOf[Long])
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any =
    LongBloom.serialize(buffer, numHashes)

  override def serialize(buffer: Array[Long]): Array[Byte] =
    LongBloom.serialize(buffer, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    LongBloom.deserializeWords(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): LongBloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LongBloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): LongBloomAgg =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native membership probe: `graft_might_contain(blob, value)` tests a
  * BIGINT against a [[LongBloomAgg]] blob. Compiles to a static call inside
  * whole-stage codegen so a bloom-pruned scan stays in one codegen span —
  * the probe reads the shared blob bytes directly (no per-row allocation).
  * Guaranteed no false negatives; false-positive rate is the standard
  * `(1 - e^(-kn/m))^k`.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType || right.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (BINARY blob, BIGINT value), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain"

  override def nullSafeEval(blob: Any, v: Any): Any =
    LongBloom.contains(blob.asInstanceOf[Array[Byte]], v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, v) =>
      s"${ev.value} = graft.functions.LongBloom.contains($blob, $v);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}

/** [[BloomMightContain]] with the blob carried as a SparkContext broadcast
  * instead of an expression: the task binary serializes only the broadcast
  * HANDLE (a few bytes), the blob ships once per executor through the
  * torrent protocol, and codegen caches the resolved `byte[]` in a field —
  * so neither blob size nor row count multiplies the cost. This is the
  * transport for sketches past literal-friendly size (a BINARY literal is
  * re-deserialized per task with the task binary; a BINARY attribute from
  * a row is copied out of the UnsafeRow PER ROW — measured as a 1000x
  * regression on the triangle pruner).
  *
  * Built directly as a Column (ExpressionUtils.column) rather than through
  * the function registry: a registry builder can only receive Expression
  * children, and the whole point is that the blob is NOT an expression.
  */
case class BloomMightContainBc(
    bc: org.apache.spark.broadcast.Broadcast[Array[Byte]],
    child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a BIGINT value, got ${child.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_might_contain_bc"

  override protected def nullSafeEval(v: Any): Any =
    LongBloom.contains(bc.value, v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // raw Broadcast type: Janino's generics support is not to be relied on
    val bcRef = ctx.addReferenceObj("bloomBc", bc,
      "org.apache.spark.broadcast.Broadcast")
    val blob = ctx.addMutableState("byte[]", "bloomBlob",
      v => s"$v = (byte[]) $bcRef.value();")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LongBloom.contains($blob, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainBc =
    copy(child = newChild)
}
