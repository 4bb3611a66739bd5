package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Encoding-damage detection kernel — the crawl-QA pass that catches
  * text which survived charset sniffing WRONG (mojibake) or carries
  * decoder fallout. Four typed integer counts in one code point
  * traversal of the RAW text (this op must not run on case-folded
  * text: lowercasing maps the mojibake lead bytes Ã→ã and destroys
  * the signature):
  *
  *  - `n_replacement` — U+FFFD, a decoder already gave up here;
  *  - `n_c1_controls` — U+0080..U+009F, the latin-1-misdecode image
  *    of UTF-8 continuation bytes (never legitimate in text);
  *  - `n_double_utf8` — U+00C2/U+00C3 followed by a char in
  *    U+0080..U+00BF: the two-byte-UTF-8-lead-plus-continuation pair
  *    as seen through a latin-1 misdecode ("Ã©" for "é") — the
  *    classic double-encoding signature, counted per lead position;
  *  - `n_c0_controls` — C0 controls except tab/LF/CR.
  *
  * Counts are position-level and category-independent (a char can
  * count as C1 and as a pair continuation); both engines scan left to
  * right, so the counts are exact integers either way. */
object EncodingKernels {

  /** [n_replacement, n_c1_controls, n_double_utf8, n_c0_controls]. */
  def artifacts(s: UTF8String): ArrayData = {
    val str = s.toString
    var rep = 0L
    var c1 = 0L
    var dbl = 0L
    var c0 = 0L
    var prev = -1
    var j = 0
    while (j < str.length) {
      val c = str.codePointAt(j)
      if (c == 0xFFFD) rep += 1L
      else if (c >= 0x80 && c <= 0x9F) c1 += 1L
      else if (c < 0x20 && c != '\t' && c != '\n' && c != '\r') c0 += 1L
      if ((prev == 0xC2 || prev == 0xC3) && c >= 0x80 && c <= 0xBF) dbl += 1L
      prev = c
      j += Character.charCount(c)
    }
    ArrayData.toArrayData(Array(rep, c1, dbl, c0))
  }
}

/** Four encoding-artifact counts of a RAW text column — one
  * [[EncodingKernels.artifacts]] call per row, fully codegen'd. */
case class EncodingArtifacts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "encoding_artifacts"
  override protected def nullSafeEval(s: Any): Any =
    EncodingKernels.artifacts(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.EncodingKernels.artifacts($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object encoding {
  def encoding_artifacts(rawText: Column): Column =
    GraftBridge.column(EncodingArtifacts(GraftBridge.expression(rawText)))
}
