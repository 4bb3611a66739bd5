package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native codegen kernels for the hashing-heavy dedup/similarity ops.
  *
  * The SQL-function forms of these (`transform(sequence(0, k), h ->
  * aggregate(...))`) nest lambda functions, which drops Catalyst out of
  * whole-stage codegen into interpreted per-element evaluation —
  * measured ~17µs per inner step on the minhash pipeline. Each kernel
  * here is one static JIT-friendly loop over a primitive long array
  * (~1ns per step), invoked from generated code as a single call.
  */
object HashKernels {

  /** xxhash64-finalizer-style avalanche of a long with a seed: the
    * cheap hash family over pre-hashed tokens. */
  @inline def mix64(x0: Long, seed: Long): Long = {
    var x = x0 + (seed * 0x9E3779B97F4A7C15L)
    x ^= x >>> 33
    x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33
    x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** sig[h] = min over a of mix64(a(i), h), h in [0, numHashes). */
  def minHashSig(a: ArrayData, numHashes: Int): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        val v = mix64(a.getLong(i), h)
        if (v < m) m = v
        i += 1
      }
      out(h) = m
      h += 1
    }
    ArrayData.toArrayData(out)
  }

  /** 64-bit simhash from pre-hashed tokens: bit j set iff the count of
    * tokens with bit j set exceeds half. */
  def simHash(a: ArrayData): Long = {
    val n = a.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val v = a.getLong(i)
      var j = 0
      while (j < 64) {
        if (((v >>> j) & 1L) == 1L) counts(j) += 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      // sum of (+1/-1) > 0  <=>  ones > n - ones
      if (2 * counts(j) > n) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** key[b] = order-dependent fold of mix64 over the b-th band slice of
    * the signature (bands of rows = sig.length / bands). */
  def bandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    val rows = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = b.toLong
      var r = 0
      while (r < rows) {
        acc = mix64(sig.getLong(b * rows + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    ArrayData.toArrayData(out)
  }
}

/** MinHash signature of a pre-hashed shingle set. */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_signature"
  override protected def nullSafeEval(a: Any): Any =
    HashKernels.minHashSig(a.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashKernels.minHashSig($a, $numHashes)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** SimHash64 of a pre-hashed token array. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(a: Any): Any =
    HashKernels.simHash(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashKernels.simHash($a)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** LSH band keys of a minhash signature. */
case class LshBandKeys(child: Expression, bands: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_band_keys"
  override protected def nullSafeEval(a: Any): Any =
    HashKernels.bandKeys(a.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.HashKernels.bandKeys($a, $bands)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Column-level API. */
object hashes {
  private def expr(c: Column): Expression = GraftBridge.expression(c)
  private def col(e: Expression): Column = GraftBridge.column(e)

  def minhash_signature(hashedShingles: Column, numHashes: Int): Column =
    col(MinHashSignature(expr(hashedShingles), numHashes))

  def simhash64(hashedTokens: Column): Column =
    col(SimHash64(expr(hashedTokens)))

  def lsh_band_keys(sig: Column, bands: Int): Column =
    col(LshBandKeys(expr(sig), bands))
}
