package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native text kernels: one byte-scan per document instead of
  * per-element SQL lambdas over word arrays. */
object TextKernels {

  /** Split a NORMALIZED string (single-space separated) into chunks of
    * at most k words, as byte slices — semantically identical to
    * `transform(sequence(0, ceil(W/k)-1), i -> concat_ws(' ',
    * slice(split(t, ' '), i*k+1, k)))` but O(bytes) total: word
    * boundaries are space positions, and a chunk of consecutive words
    * IS a contiguous byte range of the input. */
  def chunkWords(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val numBytes = s.numBytes()
    var numWords = 1
    var i = 0
    while (i < numBytes) {
      if (Platform.getByte(base, off + i) == ' ') numWords += 1
      i += 1
    }
    val starts = new Array[Int](numWords + 1)
    var w = 1
    i = 0
    while (i < numBytes) {
      if (Platform.getByte(base, off + i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = numBytes + 1 // sentinel: end(j) = starts(j+1) - 1
    val nChunks = (numWords + k - 1) / k
    val out = new Array[UTF8String](nChunks)
    var c = 0
    while (c < nChunks) {
      val from = starts(c * k)
      val to = starts(math.min((c + 1) * k, numWords)) - 1
      val bytes = new Array[Byte](to - from)
      Platform.copyMemory(base, off + from, bytes, Platform.BYTE_ARRAY_OFFSET, to - from)
      out(c) = UTF8String.fromBytes(bytes)
      c += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** Word chunks (<= k words each) of a normalized text column. */
case class ChunkWords(child: Expression, k: Int) extends UnaryExpression {
  require(k > 0, "chunk size must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "chunk_words"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.chunkWords(s.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.chunkWords($s, $k)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object text {
  def chunk_words(normText: Column, k: Int): Column =
    GraftBridge.column(ChunkWords(GraftBridge.expression(normText), k))
}
