package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** K-minimum-values distinct-count sketch over pre-hashed 62-bit
  * non-negative longs ([[hashes.hash62]]).
  *
  * State is the set of the k smallest distinct hashes seen — bounded at
  * k longs however many rows flow through, with an order-free merge
  * (set union + trim), so map-side partial aggregation applies and the
  * shuffle carries at most k longs per (group, partition).
  *
  * The estimator is chosen for cross-engine exactness, not minimal
  * variance: with fewer than k distinct hashes the state IS the
  * distinct set (exact count); at k the estimate is
  * `(k-1) * 2^62 / r_k` with `r_k` the k-th smallest hash — pure
  * integer arithmetic, no logarithm, no float sum, so a SQL oracle
  * reproduces the value bit-for-bit (unlike HyperLogLog's bias-
  * corrected harmonic mean, whose `ln` differs across libm
  * implementations). Relative error ~ 1/sqrt(k-2): ~3% at k = 1024. */
case class KmvDistinctAgg(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k > 1, s"k must exceed 1, got $k")

  override def prettyName: String = "kmv_distinct"
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  private def add(buf: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    if (buf.size < k) { buf.add(v); () }
    else if (v < buf.last()) {
      if (buf.add(v)) { buf.pollLast(); () }
    }
  }

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buf, it.next())
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any =
    if (buf.size < k) buf.size.toLong
    else (BigInt(k - 1) * (BigInt(1) << 62) / BigInt(buf.last())).toLong

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.size * 8)
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val out = new java.util.TreeSet[java.lang.Long]()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.hasRemaining) out.add(bb.getLong)
    out
  }

  override def withNewMutableAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinctAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvDistinctAgg =
    copy(child = c)
}

/** Column-level API. */
object sketch {
  import org.apache.spark.sql.GraftBridge

  def kmv_distinct(hash: Column, k: Int): Column =
    GraftBridge.column(KmvDistinctAgg(GraftBridge.expression(hash), k)
      .toAggregateExpression())
}
