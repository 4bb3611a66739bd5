package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** A BOUNDED interpolated-Kneser–Ney bigram model as a broadcastable
  * lookup table — the deployment shape of
  * [[graft.operators.TextStats.knBigramScore]]'s reference-model
  * regime: the LM is trained once on reference text (bounded by
  * construction — the [[BpeTable]] bounded-vocabulary contract), and
  * scoring becomes a ROW-LOCAL kernel call: no joins, no shuffle, no
  * state — which is what lets a STREAMING micro-batch score documents
  * online in append mode with zero state store.
  *
  * Count identity is the same xxhash64-of-word the batch operator
  * shuffles (seed 42, exact byte equality with
  * `xxhash64(substring_index(gram, ' ', ...))`), so kernel scores are
  * bit-identical to the batch join path — spec-pinned. The arithmetic
  * runs in BigInteger cross-multiplication (the counts are unbounded
  * even when the TYPE count is bounded), flooring exactly like the
  * batch `div`. */
final class KnLmTable(
    bvK: Array[Long], bwK: Array[Long], bC: Array[Long],
    cvKey: Array[Long], cvN: Array[Long], cvN1: Array[Long],
    n1Key: Array[Long], n1N: Array[Long],
    val ncc: Long, val vv: Long) extends Serializable {

  @transient private lazy val cvwMap:
      java.util.HashMap[java.lang.Long, java.util.HashMap[java.lang.Long, java.lang.Long]] = {
    val m = new java.util.HashMap[java.lang.Long, java.util.HashMap[java.lang.Long, java.lang.Long]]()
    var i = 0
    while (i < bvK.length) {
      var inner = m.get(bvK(i))
      if (inner == null) {
        inner = new java.util.HashMap[java.lang.Long, java.lang.Long]()
        m.put(bvK(i), inner)
      }
      inner.put(bwK(i), bC(i))
      i += 1
    }
    m
  }
  @transient private lazy val cvMap:
      java.util.HashMap[java.lang.Long, Array[Long]] = {
    val m = new java.util.HashMap[java.lang.Long, Array[Long]]()
    var i = 0
    while (i < cvKey.length) {
      m.put(cvKey(i), Array(cvN(i), cvN1(i)))
      i += 1
    }
    m
  }
  @transient private lazy val n1Map:
      java.util.HashMap[java.lang.Long, java.lang.Long] = {
    val m = new java.util.HashMap[java.lang.Long, java.lang.Long]()
    var i = 0
    while (i < n1Key.length) { m.put(n1Key(i), n1N(i)); i += 1 }
    m
  }

  def types: Int = bvK.length

  private val M = BigInteger.valueOf(1000000L)

  /** Score ONE normalized document: (n_bigrams, oov_bigrams,
    * score_micro | null). Bit-identical to the batch join path. */
  def score(normText: UTF8String): InternalRow = {
    val bytes = normText.getBytes // materialized copy; words are slices
    val n = bytes.length
    // word boundaries on single spaces (the normalized contract)
    var numWords = 1
    var i = 0
    while (i < n) { if (bytes(i) == ' ') numWords += 1; i += 1 }
    if (numWords < 2) return InternalRow(0L, 0L, null)
    val starts = new Array[Int](numWords + 1)
    var w = 1
    i = 0
    while (i < n) {
      if (bytes(i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = n + 1
    def hashWord(j: Int): Long = {
      val from = starts(j)
      val to = starts(j + 1) - 1
      XXH64.hashUnsafeBytes(bytes,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        to - from, 42L)
    }
    val nccp = BigInteger.valueOf(ncc + vv + 1L)
    var sum = 0L
    var oov = 0L
    var prev = hashWord(0)
    var j = 1
    while (j < numWords) {
      val cur = hashWord(j)
      val inner = cvwMap.get(prev)
      val c: java.lang.Long = if (inner == null) null else inner.get(cur)
      val cvE = cvMap.get(prev)
      val n1E = n1Map.get(cur)
      val n1w = if (n1E == null) 0L else n1E.longValue()
      val micro = if (cvE != null) {
        val cval = if (c == null) 0L else c.longValue()
        val a = math.max(4L * cval - 3L, 0L)
        val num = BigInteger.valueOf(a).multiply(nccp)
          .add(BigInteger.valueOf(3L * cvE(1)).multiply(
            BigInteger.valueOf(n1w + 1L)))
        val den = BigInteger.valueOf(4L * cvE(0)).multiply(nccp)
        M.multiply(num).divide(den).longValueExact()
      } else {
        M.multiply(BigInteger.valueOf(n1w + 1L)).divide(nccp)
          .longValueExact()
      }
      sum += micro
      if (c == null) oov += 1L
      prev = cur
      j += 1
    }
    InternalRow(numWords - 1L, oov, sum / (numWords - 1L))
  }
}

/** Row-local KN scoring of a normalized text column against a
  * broadcast [[KnLmTable]]: struct(n_bigrams, oov_bigrams,
  * score_micro). */
case class KnScore(child: Expression, table: KnLmTable)
    extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("oov_bigrams", LongType, nullable = false),
    StructField("score_micro", LongType, nullable = true)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "kn_score"
  override protected def nullSafeEval(s: Any): Any =
    table.score(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("knTable", table, classOf[KnLmTable].getName)
    defineCodeGen(ctx, ev, s => s"$ref.score($s)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}
