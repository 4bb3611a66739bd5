package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass quality-signal kernel over a NORMALIZED text:
  * `[stop_hits, n_tokens, punct, n_chars]`, the four integers behind
  * the corpus quality key (stopword-permille − punctuation-permille)
  * and [[graft.operators.TextStats.qualityScore]]'s ratios.
  *
  * Semantics mirror the composed built-in form EXACTLY:
  * `n_tokens = size(split(t, " "))` (spaces + 1 — split keeps empty
  * tokens), `stop_hits` counts tokens string-equal to an
  * [[graft.operators.TextStats.enStopwords]] entry, `punct` counts
  * code points outside `[a-z0-9 ]`, `n_chars` counts code points.
  * The built-in form's stopword test is an interpreted higher-order
  * filter (~30 OR-compares per word, outside codegen) — measured
  * 29.8 s for the 500k-doc sf10 quality scan; this kernel is one
  * traversal with a hash-set probe per token. */
object QualityKernels {

  private val stopSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    graft.operators.TextStats.enStopwords.foreach(s.add)
    s
  }

  def stats(s: UTF8String): ArrayData = {
    val str = s.toString
    var stopHits = 0L
    var nTokens = 1L // split(" ") yields spaces + 1 tokens, "" included
    var punct = 0L
    var nChars = 0L
    var tokStart = 0
    var j = 0
    while (j < str.length) {
      val c = str.codePointAt(j)
      nChars += 1L
      if (c == ' ') {
        nTokens += 1L
        if (stopSet.contains(str.substring(tokStart, j))) stopHits += 1L
        tokStart = j + 1
      } else if (!(c >= 'a' && c <= 'z') && !(c >= '0' && c <= '9')) {
        punct += 1L
      }
      j += Character.charCount(c)
    }
    if (stopSet.contains(str.substring(tokStart))) stopHits += 1L
    ArrayData.toArrayData(Array(stopHits, nTokens, punct, nChars))
  }
}

/** The four quality-signal longs of a normalized text column — one
  * [[QualityKernels.stats]] call per row, fully codegen'd. */
case class QualityStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "quality_stats"
  override protected def nullSafeEval(s: Any): Any =
    QualityKernels.stats(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.QualityKernels.stats($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object quality {
  def quality_stats(normText: Column): Column =
    GraftBridge.column(QualityStats(GraftBridge.expression(normText)))
}
