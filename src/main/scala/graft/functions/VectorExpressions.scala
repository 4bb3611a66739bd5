package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native codegen kernels for embedding math over Array[Float] columns.
  *
  * Numerics contract: both kernels are strictly sequential left folds
  * in double, element order 0..n-1 — the exact IEEE op sequence of the
  * SQL form `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  * 0.0, (acc, v) -> acc + v)` and of the DuckDB oracle's list_reduce
  * mirror — so swapping the SQL folds for these kernels changes
  * nothing in any result bit. */
object VectorKernels {

  /** Sequential-fold dot product of two float vectors, in double. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** sqrt of the sequential-fold sum of squares, in double. */
  def norm(a: ArrayData): Double = {
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      val v = a.getFloat(i).toDouble
      acc += v * v
      i += 1
    }
    math.sqrt(acc)
  }

  /** Random-hyperplane LSH bucket: bit b set iff the dot product of the
    * vector with the b-th pseudo-random +-1 hyperplane is positive.
    * Hyperplane signs come from [[HashKernels.lehmer3]] parity of
    * (b << 20 | j) and the fold is strictly sequential in double, so a
    * DuckDB oracle replays the bucket bit-for-bit (signs from plain
    * 47-bit integer arithmetic, dot from the same IEEE op sequence). */
  def rhpBucket(a: ArrayData, nBits: Int): Int =
    rhpFingerprint(a, nBits).toInt

  /** Hyperplane signs depend only on (bit, component) — materialized
    * once per (nBits, dims) per JVM instead of re-deriving lehmer3 for
    * every row x bit x component (the values are identical; this is
    * pure memoization, so oracle replication is unaffected). */
  private val signCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Double]]()

  private def signs(nBits: Int, dims: Int): Array[Double] =
    signCache.computeIfAbsent(nBits.toLong << 32 | dims, { key =>
      val out = new Array[Double](nBits * dims)
      var b = 0
      while (b < nBits) {
        var j = 0
        while (j < dims) {
          out(b * dims + j) =
            if ((HashKernels.lehmer3(b.toLong << 20 | j) & 1L) == 1L) 1.0 else -1.0
          j += 1
        }
        b += 1
      }
      out
    })

  /** Long-form signature for banded LSH: up to 62 hyperplane sign
    * bits, split by callers into per-band keys. */
  def rhpFingerprint(a: ArrayData, nBits: Int): Long = {
    val n = a.numElements()
    val sg = signs(nBits, n)
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      var acc = 0.0
      val off = b * n
      var j = 0
      while (j < n) {
        acc += a.getFloat(j) * sg(off + j)
        j += 1
      }
      if (acc > 0) bucket |= 1L << b
      b += 1
    }
    bucket
  }
}

object VectorKernelsCentroid {
  /** argmax over centroids of cosine(vec, centroid); ties -> lowest id.
    * Zero vectors go to list 0. */
  def nearest(a: ArrayData, cents: Array[Array[Double]]): Int = {
    val n = a.numElements()
    var best = -1
    var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val cv = cents(c)
      var dot = 0.0; var nc = 0.0; var na = 0.0
      var i = 0
      val m = math.min(n, cv.length)
      while (i < m) {
        val x = a.getFloat(i).toDouble
        dot += x * cv(i); nc += cv(i) * cv(i); na += x * x
        i += 1
      }
      val sim = if (nc == 0 || na == 0) -2.0 else dot / (math.sqrt(nc) * math.sqrt(na))
      if (sim > bestSim) { bestSim = sim; best = c }
      c += 1
    }
    math.max(best, 0)
  }
}

case class NearestCentroid(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "nearest_centroid"
  override protected def nullSafeEval(a: Any): Any =
    VectorKernelsCentroid.nearest(a.asInstanceOf[ArrayData], centroids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroids, "double[][]")
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernelsCentroid.nearest($a, $ref)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class VectorNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vector_norm"
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.norm(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.norm($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class RhpBucket(child: Expression, nBits: Int) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rhp_bucket"
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.rhpBucket(a.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.rhpBucket($a, $nBits)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class RhpFingerprint(child: Expression, nBits: Int) extends UnaryExpression {
  require(nBits <= 62, "fingerprint must stay non-negative in a long")
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rhp_fingerprint"
  override protected def nullSafeEval(a: Any): Any =
    VectorKernels.rhpFingerprint(a.asInstanceOf[ArrayData], nBits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.VectorKernels.rhpFingerprint($a, $nBits)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column-level API. */
object vectors {
  private def expr(c: Column): Expression = GraftBridge.expression(c)
  private def col(e: Expression): Column = GraftBridge.column(e)

  def vector_dot(a: Column, b: Column): Column = col(VectorDot(expr(a), expr(b)))
  def vector_norm(a: Column): Column = col(VectorNorm(expr(a)))
  def rhp_bucket(a: Column, nBits: Int): Column = col(RhpBucket(expr(a), nBits))
  def rhp_fingerprint(a: Column, nBits: Int): Column = col(RhpFingerprint(expr(a), nBits))
  def nearest_centroid(a: Column, centroids: Array[Array[Double]]): Column =
    col(NearestCentroid(expr(a), centroids))
}
