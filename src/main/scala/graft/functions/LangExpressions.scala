package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.LangProfiles

/** Single-pass language-ID scoring kernel: all 12 [[LangProfiles]]
  * scores in ONE traversal of the text — trigram hits via a sorted
  * long-key table (three code points pack into 63 bits: each code
  * point < 0x110000 < 2^21), script points via code-point range tests
  * fused into the same loop. Replaces the composed built-in form
  * (12 languages x |grams| x 60-entry interpreted array scans) that
  * measured ~1.5k docs/s at sf1 — this is O(len) per document with
  * ~10 binary-search compares per gram and zero allocation beyond the
  * code-point array. Semantics are BIT-IDENTICAL to the DuckDB oracle
  * rendering: 2 points per trigram hit over ' '+text+' ', script
  * weights per [[LangProfiles.scriptRanges]]. */
object LangKernels {

  val n: Int = LangProfiles.langs.length

  private def pack(c0: Int, c1: Int, c2: Int): Long =
    (c0.toLong << 42) | (c1.toLong << 21) | c2.toLong

  /** Sorted packed-trigram keys, parallel to [[hitLangs]]. */
  private val (triKeys: Array[Long], hitLangs: Array[Array[Int]]) = {
    val m = new java.util.TreeMap[java.lang.Long, List[Int]]()
    LangProfiles.profiles.zipWithIndex.foreach { case (prof, li) =>
      prof.foreach { g =>
        val cps = g.codePoints().toArray
        require(cps.length == 3, s"profile gram '$g' is not a trigram")
        val k = pack(cps(0), cps(1), cps(2))
        m.merge(k, List(li), (a, b) => a ++ b)
      }
    }
    val keys = new Array[Long](m.size)
    val vals = new Array[Array[Int]](m.size)
    var i = 0
    m.forEach { (k, v) => keys(i) = k; vals(i) = v.distinct.sorted.toArray; i += 1 }
    (keys, vals)
  }

  // script-range tests inlined below; indices resolved once
  private val ruIdx = LangProfiles.langs.indexOf("ru")
  private val arIdx = LangProfiles.langs.indexOf("ar")
  private val koIdx = LangProfiles.langs.indexOf("ko")
  private val jaIdx = LangProfiles.langs.indexOf("ja")
  private val zhIdx = LangProfiles.langs.indexOf("zh")

  /** All 12 scores of one NORMALIZED text (padding applied here). */
  def scores(s: UTF8String): ArrayData = {
    val str = s.toString
    // code points with the virtual ' ' pad on both ends
    val cps = new Array[Int](str.codePointCount(0, str.length) + 2)
    cps(0) = ' '
    var j = 0
    var k = 1
    while (j < str.length) {
      val c = str.codePointAt(j)
      cps(k) = c
      k += 1
      j += Character.charCount(c)
    }
    cps(k) = ' '
    val out = new Array[Long](n)
    var p = 0
    val last = cps.length - 2
    while (p < last) {
      val key = pack(cps(p), cps(p + 1), cps(p + 2))
      val idx = java.util.Arrays.binarySearch(triKeys, key)
      if (idx >= 0) {
        val hit = hitLangs(idx)
        var i = 0
        while (i < hit.length) { out(hit(i)) += 2L; i += 1 }
      }
      p += 1
    }
    // script points over the same padded text (spaces hit no range)
    var q = 0
    while (q < cps.length) {
      val c = cps(q)
      if (c >= 0x0400 && c <= 0x04FF) out(ruIdx) += 1L
      else if (c >= 0x0600 && c <= 0x06FF) out(arIdx) += 1L
      else if ((c >= 0xAC00 && c <= 0xD7AF) || (c >= 0x1100 && c <= 0x11FF))
        out(koIdx) += 3L
      else if (c >= 0x3040 && c <= 0x30FF) out(jaIdx) += 3L
      else if (c >= 0x4E00 && c <= 0x9FFF) { out(jaIdx) += 1L; out(zhIdx) += 2L }
      q += 1
    }
    ArrayData.toArrayData(out)
  }

  /** All padded trigrams of one NORMALIZED text, as strings — the
    * same ' '+t+' ' code-point slicing the score path and the SQL
    * oracle use. Sub-trigram input (empty text -> '  ') yields an
    * empty array. */
  def charTrigrams(s: UTF8String): ArrayData = {
    val str = s.toString
    val cps = new Array[Int](str.codePointCount(0, str.length) + 2)
    cps(0) = ' '
    var j = 0
    var k = 1
    while (j < str.length) {
      val c = str.codePointAt(j)
      cps(k) = c
      k += 1
      j += Character.charCount(c)
    }
    cps(k) = ' '
    val m = cps.length - 2
    val out = new Array[UTF8String](if (m > 0) m else 0)
    var p = 0
    while (p < m) {
      out(p) = UTF8String.fromString(new String(cps, p, 3))
      p += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** All padded code-point trigrams of a normalized text column as
  * strings — the extraction [[graft.operators.TextStats.langProfilesTrain]]
  * explodes (equivalent to `transform(sequence(1, len-2),
  * i -> substring(' '||t||' ', i, 3))` but one codegen kernel call:
  * the interpreted higher-order form measured ~10x slower at sf10). */
case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_trigrams"
  override protected def nullSafeEval(s: Any): Any =
    LangKernels.charTrigrams(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.LangKernels.charTrigrams($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Array of the 12 language scores of a normalized text column —
  * one [[LangKernels.scores]] call per row, fully codegen'd. */
case class LangScores(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lang_scores"
  override protected def nullSafeEval(s: Any): Any =
    LangKernels.scores(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.LangKernels.scores($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object lang {
  def lang_scores(normText: Column): Column =
    GraftBridge.column(LangScores(GraftBridge.expression(normText)))
  def char_trigrams(normText: Column): Column =
    GraftBridge.column(CharTrigrams(GraftBridge.expression(normText)))
}
