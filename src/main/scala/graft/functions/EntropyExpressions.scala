package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Integer-exact Shannon-entropy gauge kernel (character and
  * whitespace-token distributions of a normalized text, one pass).
  *
  * Floating-point logs are not portable across engines, so the gauge
  * is DEFINED in fixed point: `l(x) = 1000·k + M(m)` where
  * `k = floor(log2 x)` (exact, from the bit length), the mantissa
  * index `m = floor(x·1024 / 2^k) - 1024` quantizes x/2^k ∈ [1,2) to
  * 1/1024 steps, and `M(m) = floor(1000·log2(1 + m/1024))` is a
  * 1024-entry table computed ONCE in this JVM — the oracle SQL embeds
  * the table's literal values (the [[graft.operators.LangProfiles]]
  * pattern), so both engines evaluate the identical integer formula
  * and the result is hash-exact. `l` underestimates 1000·log2 by at
  * most ~2.4 milli-bits (mantissa quantization + table floor); the
  * gauge's contract is this fixed-point definition, not the
  * real-valued entropy.
  *
  * Milli-entropy of a count multiset {c_i, Σc_i = N}:
  * `floor(Σ c_i·(l(N) - l(c_i)) / N)` — the plug-in estimator
  * H = Σ (c/N)·log2(N/c) in milli-bits, all-integer.
  */
object EntropyKernels {

  /** M(m) = floor(1000·log2(1 + m/1024)), m ∈ [0, 1024). */
  val mantissaMilliLog: Array[Long] = Array.tabulate(1024) { i =>
    math.floor(1000.0 * math.log1p(i / 1024.0) / math.log(2.0)).toLong
  }

  /** Fixed-point milli-log2: exact integer path, x ≥ 1. */
  def l(x: Long): Long = {
    val k = 63 - java.lang.Long.numberOfLeadingZeros(x)
    1000L * k + mantissaMilliLog((((x << 10) >>> k) - 1024L).toInt)
  }

  private def milliEntropy(counts: Array[Long], m: Int, n: Long): Long = {
    if (n <= 0L) return 0L
    val ln = l(n)
    var s = 0L
    var i = 0
    while (i < m) { s += counts(i) * (ln - l(counts(i))); i += 1 }
    s / n
  }

  /** [n_chars, n_distinct_chars, milli_char_entropy,
    *  n_tokens, n_distinct_tokens, milli_token_entropy,
    *  token_entropy_permille] of a NORMALIZED (lowercase,
    * single-space, trimmed) text in one code point traversal.
    * `token_entropy_permille` is the token entropy relative to its
    * uniform maximum, `floor(1000·hTok / l(n_tokens))` — 1000 means
    * every token distinct, 0 means one token repeated; defined as
    * 1000 for n_tokens < 2 (a single token is vacuously
    * non-repetitive; the char gauge catches degenerate docs). Empty
    * text → all zeros except permille = 1000. */
  def stats(s: UTF8String): ArrayData = {
    val str = s.toString
    if (str.isEmpty)
      return ArrayData.toArrayData(Array(0L, 0L, 0L, 0L, 0L, 0L, 1000L))
    // char counts: ASCII fast path + overflow map for the rest
    val ascii = new Array[Long](128)
    var wide: java.util.HashMap[Integer, java.lang.Long] = null
    val tokCounts = new java.util.HashMap[String, java.lang.Long]()
    val one = java.lang.Long.valueOf(1L)
    val add = new java.util.function.BiFunction[java.lang.Long, java.lang.Long, java.lang.Long] {
      def apply(a: java.lang.Long, b: java.lang.Long) =
        java.lang.Long.valueOf(a.longValue + b.longValue)
    }
    var nChars = 0L
    var tokStart = 0
    var j = 0
    while (j < str.length) {
      val c = str.codePointAt(j)
      nChars += 1L
      if (c < 128) ascii(c) += 1L
      else {
        if (wide == null) wide = new java.util.HashMap[Integer, java.lang.Long]()
        wide.merge(c, one, add)
      }
      if (c == ' ') {
        tokCounts.merge(str.substring(tokStart, j), one, add)
        tokStart = j + 1
      }
      j += Character.charCount(c)
    }
    tokCounts.merge(str.substring(tokStart), one, add)
    val wideN = if (wide == null) 0 else wide.size
    val charArr = new Array[Long](128 + wideN)
    var nc = 0
    var i = 0
    while (i < 128) { if (ascii(i) > 0L) { charArr(nc) = ascii(i); nc += 1 }; i += 1 }
    if (wide != null) {
      val wv = wide.values.iterator()
      while (wv.hasNext) { charArr(nc) = wv.next().longValue; nc += 1 }
    }
    val hChar = milliEntropy(charArr, nc, nChars)
    var nTokens = 0L
    val tokArr = new Array[Long](tokCounts.size)
    var ti = 0
    val tv = tokCounts.values.iterator()
    while (tv.hasNext) { val c = tv.next().longValue; tokArr(ti) = c; nTokens += c; ti += 1 }
    val hTok = milliEntropy(tokArr, ti, nTokens)
    val perm = if (nTokens < 2L) 1000L else hTok * 1000L / l(nTokens)
    ArrayData.toArrayData(
      Array(nChars, nc.toLong, hChar, nTokens, tokCounts.size.toLong, hTok, perm))
  }
}

/** Six entropy-gauge longs of a normalized text column — one
  * [[EntropyKernels.stats]] call per row, fully codegen'd (the
  * composed higher-order-function form would re-scan the char array
  * once per distinct symbol; this is O(len)). */
case class EntropyStats(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "entropy_stats"
  override protected def nullSafeEval(s: Any): Any =
    EntropyKernels.stats(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.EntropyKernels.stats($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object entropy {
  def entropy_stats(normText: Column): Column =
    GraftBridge.column(EntropyStats(GraftBridge.expression(normText)))
}
