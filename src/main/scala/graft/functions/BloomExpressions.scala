package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distributed Bloom filter over 64-bit hashes: a bitset aggregate
  * (partial buffers OR-merge — commutative/associative, so map-side
  * combine applies and the shuffle carries one bitset per partition)
  * plus a scalar membership probe with codegen. The probe admits false
  * positives at the configured rate and NO false negatives — callers
  * use it as a prefilter in front of an exact join, which keeps results
  * exact while shrinking the joined volume to matches + FPs.
  *
  * Inputs are expected to already be 64-bit hashes (xxhash64 /
  * [[HashKernels.shingleHashes]]); probe positions derive from a
  * splitmix64 double-hash, deterministic across runs and engines.
  */
object BloomKernels {

  /** splitmix64 finalizer: spreads an already-hashed 64-bit value. */
  def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def set(bits: Array[Long], value: Long, k: Int): Unit = {
    val m = bits.length.toLong * 64
    val h2 = mix(value ^ 0x5851f42d4c957f2dL) | 1L
    var h = mix(value)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h, m)
      bits((idx >>> 6).toInt) |= 1L << (idx & 63)
      h += h2
      i += 1
    }
  }

  def contains(bits: ArrayData, value: Long, k: Int): Boolean = {
    val m = bits.numElements().toLong * 64
    val h2 = mix(value ^ 0x5851f42d4c957f2dL) | 1L
    var h = mix(value)
    var i = 0
    while (i < k) {
      val idx = java.lang.Long.remainderUnsigned(h, m)
      if ((bits.getLong((idx >>> 6).toInt) & (1L << (idx & 63))) == 0L) return false
      h += h2
      i += 1
    }
    true
  }
}

/** Bitset-building aggregate: `bloom_build(hash, numBits, k)` ->
  * Array[Long] of numBits/64 words. */
case class BloomBuildAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits > 0 && numBits % 64 == 0, s"numBits must be a positive multiple of 64, got $numBits")
  require(numHashes > 0, s"numHashes must be positive, got $numHashes")

  override def prettyName: String = "bloom_build"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomKernels.set(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomBuildAgg =
    copy(child = c)
}

/** Membership probe: `bloom_might_contain(bits, hash, k)` — true when
  * possibly present (FP-prone), false when definitely absent. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"
  override protected def nullSafeEval(bits: Any, value: Any): Any =
    BloomKernels.contains(bits.asInstanceOf[ArrayData],
      value.asInstanceOf[Long], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bits, v) =>
      s"graft.functions.BloomKernels.contains($bits, $v, $numHashes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column-level API. */
object bloom {
  import org.apache.spark.sql.GraftBridge
  private def expr(c: Column): Expression = GraftBridge.expression(c)
  private def col(e: Expression): Column = GraftBridge.column(e)

  def bloom_build(hash: Column, numBits: Int, numHashes: Int): Column =
    col(BloomBuildAgg(expr(hash), numBits, numHashes)
      .toAggregateExpression())

  def bloom_might_contain(bits: Column, hash: Column, numHashes: Int): Column =
    col(BloomMightContain(expr(bits), expr(hash), numHashes))
}
