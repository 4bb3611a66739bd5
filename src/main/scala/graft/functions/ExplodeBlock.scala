package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

import graft.core.Morton

/** Fused block-explode generator (SURVEY §2.7): one Generate node turns
  * a block row `(sfc_head, sfc_tail[], z[])` into point rows
  * `(x_grid, y_grid, z)` — key recombine (P5) + Morton decode (P3)
  * inlined into the unpack loop, no intermediate zipped-struct array.
  *
  * The reference's equivalent is the per-row Python loop at
  * retrieve_data.py:129-133. The alternative composition
  * (arrays_zip → explode → decode expressions) is kept in
  * BlockedCloud for comparison; this fused form avoids materializing
  * the struct array per block. */
case class ExplodeBlock(head: Expression, tails: Expression, zs: Expression,
    tailLen: Int) extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(head, tails, zs)

  override def elementSchema: StructType = StructType(Seq(
    StructField("x_grid", LongType, nullable = false),
    StructField("y_grid", LongType, nullable = false),
    StructField("z", DoubleType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val h = head.eval(input)
    val t = tails.eval(input)
    val z = zs.eval(input)
    if (h == null || t == null || z == null) Iterator.empty
    else {
      val headShifted = h.asInstanceOf[Long] << tailLen
      val ta = t.asInstanceOf[ArrayData]
      val za = z.asInstanceOf[ArrayData]
      val n = math.min(ta.numElements(), za.numElements())
      new Iterator[InternalRow] {
        private var i = 0
        private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
        override def hasNext: Boolean = i < n
        override def next(): InternalRow = {
          val key = headShifted | ta.getLong(i)
          row.update(0, Morton.decodeX(key))
          row.update(1, Morton.decodeY(key))
          row.update(2, za.getDouble(i))
          i += 1
          row
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(head = newChildren(0), tails = newChildren(1), zs = newChildren(2))
}

object generators {
  /** Column API: explode_block(head, tails, zs, tailLen) -> rows of
    * (x_grid, y_grid, z). */
  def explode_block(head: Column, tails: Column, zs: Column, tailLen: Int): Column =
    GraftBridge.column(ExplodeBlock(
      GraftBridge.expression(head), GraftBridge.expression(tails),
      GraftBridge.expression(zs), tailLen))
}
