package graft.functions

import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Native kernels for the PassJoin edit-distance join
  * ([[graft.operators.EditJoin]]): per-string segment/probe join keys
  * in one codegen'd call each — the struct-array + sequence-explode +
  * substring formulation evaluates interpreted per element and
  * allocates a UTF8String per probe substring; these emit the 8-byte
  * keys directly from the codepoint buffer.
  *
  * Key = FNV-1a-64 over (source length, segment index, segment
  * codepoints). Both sides use the same function, so key equality is
  * implied by segment equality (no candidate lost); a collision only
  * adds a candidate the levenshtein verify removes.
  */
object EditKernels {

  private def codepoints(s: UTF8String): Array[Int] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < nb) {
      if (Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) {
      val a = new Array[Int](nb)
      var j = 0
      while (j < nb) { a(j) = Platform.getByte(base, off + j); j += 1 }
      a
    } else {
      val str = s.toString
      val a = new Array[Int](str.codePointCount(0, str.length))
      var j = 0
      var k = 0
      while (j < str.length) {
        val c = str.codePointAt(j)
        a(k) = c
        k += 1
        j += Character.charCount(c)
      }
      a
    }
  }

  private val FnvOffset = 0xcbf29ce484222325L
  private val FnvPrime = 0x100000001b3L

  private def segHash(cps: Array[Int], start: Int, len: Int,
      srcLen: Int, segIdx: Int): Long = {
    var h = FnvOffset
    h = (h ^ srcLen) * FnvPrime
    h = (h ^ segIdx) * FnvPrime
    var j = 0
    while (j < len) {
      h = (h ^ cps(start + j)) * FnvPrime
      j += 1
    }
    h
  }

  /** The `tau + 1` index-side keys: even partition of the string with
    * the longer segments last (`base = m / k`, `rem = m % k`; segment
    * `i` starts at `i * base + max(0, i - (k - rem))`). */
  def editSegmentKeys(s: UTF8String, tau: Int): ArrayData = {
    val cps = codepoints(s)
    val m = cps.length
    val k = tau + 1
    val b = m / k
    val rem = m % k
    val out = new Array[Long](k)
    var i = 0
    while (i < k) {
      val start = i * b + math.max(0, i - (k - rem))
      val li = b + (if (i >= k - rem) 1 else 0)
      out(i) = segHash(cps, start, li, m, i)
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** The probe-side keys: for every plausible index length
    * `l = m + dl, |dl| <= tau` and segment `i`, the substrings at the
    * multi-match-aware start window
    * `[max(0, p_i - i, p_i - dl - (tau - i)),
    *   min(m - l_i, p_i + i, p_i - dl + (tau - i))]`. */
  def editProbeKeys(s: UTF8String, tau: Int): ArrayData = {
    val cps = codepoints(s)
    val m = cps.length
    val k = tau + 1
    val w = 2 * tau + 1
    val out = new Array[Long](w * w * k)
    var c = 0
    var dl = -tau
    while (dl <= tau) {
      val l = m + dl
      if (l >= 0) {
        val b = l / k
        val rem = l % k
        var i = 0
        while (i < k) {
          val pi = i * b + math.max(0, i - (k - rem))
          val li = b + (if (i >= k - rem) 1 else 0)
          val lo = math.max(0, math.max(pi - i, pi - dl - (tau - i)))
          val hi = math.min(m - li, math.min(pi + i, pi - dl + (tau - i)))
          var p = lo
          while (p <= hi) {
            out(c) = segHash(cps, p, li, l, i)
            c += 1
            p += 1
          }
          i += 1
        }
      }
      dl += 1
    }
    ArrayData.toArrayData(java.util.Arrays.copyOf(out, c))
  }
}

/** [[EditKernels.editSegmentKeys]] as a codegen'd expression. */
case class EditSegmentKeys(child: org.apache.spark.sql.catalyst.expressions.Expression,
    tau: Int) extends UnaryExpression {
  require(tau >= 1, "tau must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "edit_segment_keys"
  override protected def nullSafeEval(s: Any): Any =
    EditKernels.editSegmentKeys(s.asInstanceOf[UTF8String], tau)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.EditKernels.editSegmentKeys($s, $tau)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}

/** [[EditKernels.editProbeKeys]] as a codegen'd expression. */
case class EditProbeKeys(child: org.apache.spark.sql.catalyst.expressions.Expression,
    tau: Int) extends UnaryExpression {
  require(tau >= 1, "tau must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "edit_probe_keys"
  override protected def nullSafeEval(s: Any): Any =
    EditKernels.editProbeKeys(s.asInstanceOf[UTF8String], tau)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.EditKernels.editProbeKeys($s, $tau)")
  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression) = copy(child = c)
}
