package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

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

  /** Cross-engine-portable scramble: three rounds of the Lehmer minstd
    * LCG over Z_{2^31-1} (multiplier 48271, a primitive root), input
    * pre-reduced into [1, 2^31-2]. Every intermediate fits 47 bits, so
    * any engine with plain 64-bit `*` and `%` reproduces it bit-for-bit
    * — unlike [[mix64]]/xxhash64, whose mod-2^64 wrap needs int128
    * multiplication that SQL engines overflow on. Used wherever a
    * result must be replayable by the DuckDB oracle (LSH hyperplane
    * signs, IVF/PQ seeding, simhash token hashes). Output in
    * [1, 2^31-2]. */
  @inline def lehmer3(x0: Long): Long = {
    var x = (x0 % 2147483646L + 2147483646L) % 2147483646L + 1L
    x = x * 48271L % 2147483647L
    x = x * 48271L % 2147483647L
    x = x * 48271L % 2147483647L
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

  /** sig[h] = min over a of lehmer3(a(i) + h * 700001), h in
    * [0, numHashes) — the PORTABLE minhash signature (oracle-
    * replayable, unlike [[minHashSig]]'s mix64). One kernel call
    * replaces a numHashes x |set| nested higher-order expression,
    * which Spark evaluates interpreted (measured 10x the whole
    * minhash pipeline's cost at sf0.1). */
  def portableMinHashSig(a: ArrayData, numHashes: Int): ArrayData = {
    val n = a.numElements()
    val out = new Array[Long](numHashes)
    var h = 0
    while (h < numHashes) {
      var m = Long.MaxValue
      val seed = h.toLong * 700001L
      var i = 0
      while (i < n) {
        val v = lehmer3(a.getLong(i) + seed)
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

  /** Sorted distinct xxhash64 (seed 42 — SQL xxhash64) of the n-gram
    * shingles of a NORMALIZED string (single-space separated, trimmed).
    *
    * Hashes n-gram byte ranges of the input in place: a word shingle
    * `concat_ws(' ', words i..i+n-1)` is, on normalized text, exactly
    * the byte slice from the start of word i to the end of word i+n-1,
    * so no shingle string is ever materialized. Replaces the SQL-lambda
    * form `array_distinct(transform(sequence(...), i ->
    * xxhash64(concat_ws(' ', slice(split(t, ' '), i+1, n)))))`, whose
    * interpreted inner `split` re-evaluates per element — O(tokens^2)
    * per document. Same longs out (bit-identical to SQL xxhash64 of the
    * shingle strings); sorted order (the downstream set ops are
    * order-free, and sorted enables [[sortedIntersectSize]]).
    *
    * Fewer than n tokens/chars degenerates to one whole-string shingle,
    * matching `slice`/`substring` semantics of the SQL form. */
  def shingleHashes(s: UTF8String, n: Int, word: Boolean): ArrayData = {
    val out = shingleHashesRaw(s, n, word)
    // sort + in-place dedupe
    java.util.Arrays.sort(out)
    var k = 0
    var i = 0
    while (i < out.length) {
      if (k == 0 || out(i) != out(k - 1)) { out(k) = out(i); k += 1 }
      i += 1
    }
    ArrayData.toArrayData(if (k == out.length) out else java.util.Arrays.copyOf(out, k))
  }

  /** Per-POSITION shingle hashes, one per gram start, document order,
    * duplicates kept — for span-level statistics (how many positions
    * sit inside a corpus-duplicated gram), where the deduped set form
    * would lose within-doc multiplicity. Same bytes hashed as
    * [[shingleHashes]]. */
  def shingleHashesPos(s: UTF8String, n: Int, word: Boolean): ArrayData =
    ArrayData.toArrayData(shingleHashesRaw(s, n, word))

  private def shingleHashesRaw(s: UTF8String, n: Int, word: Boolean): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val numBytes = s.numBytes()
    val out: Array[Long] =
      if (word) {
        // starts(i) = byte offset of word i; normalized => single ' '
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
        starts(numWords) = numBytes + 1 // sentinel: end(k) = starts(k+1) - 1
        val m = math.max(numWords - n + 1, 1)
        val hs = new Array[Long](m)
        var j = 0
        while (j < m) {
          val from = starts(j)
          val to = starts(math.min(j + n, numWords)) - 1
          hs(j) = XXH64.hashUnsafeBytes(base, off + from, to - from, 42L)
          j += 1
        }
        hs
      } else {
        // char offsets: charOff(c) = byte offset of char c (UTF-8 aware)
        val numChars = s.numChars()
        val charOff = new Array[Int](numChars + 1)
        var c = 0
        var b = 0
        while (b < numBytes) {
          charOff(c) = b
          b += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + b))
          c += 1
        }
        charOff(numChars) = numBytes
        val m = math.max(numChars - n + 1, 1)
        val hs = new Array[Long](m)
        var j = 0
        while (j < m) {
          val from = charOff(j)
          val to = charOff(math.min(j + n, numChars))
          hs(j) = XXH64.hashUnsafeBytes(base, off + from, to - from, 42L)
          j += 1
        }
        hs
      }
    out
  }

  /** |A ∩ B| of two SORTED long arrays — one merge pass, no hash table.
    * With |A|, |B| known, Jaccard = inter / (|A| + |B| - inter). */
  def sortedIntersectSize(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    inter
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

/** Portable (lehmer3-family) MinHash signature of a pre-hashed shingle
  * set; null for an EMPTY set (matching `list_min` of an empty list =
  * NULL in the oracle rendering — such docs never reach a pair join). */
case class PortableMinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "portable_minhash_signature"
  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    if (arr.numElements() == 0) null
    else HashKernels.portableMinHashSig(arr, numHashes)
  }
  override def nullable: Boolean = true
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val code = nullSafeCodeGen(ctx, ev, a =>
      s"""if ($a.numElements() == 0) { ${ev.isNull} = true; }
         else { ${ev.value} = graft.functions.HashKernels.portableMinHashSig($a, $numHashes); }""")
    code
  }
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

/** Sorted distinct shingle hashes of a normalized text column. */
case class ShingleHashes(child: Expression, n: Int, word: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes"
  override protected def nullSafeEval(s: Any): Any =
    HashKernels.shingleHashes(s.asInstanceOf[UTF8String], n, word)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashKernels.shingleHashes($s, $n, $word)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Per-position (non-deduped, document-order) shingle hashes. */
case class ShingleHashesPos(child: Expression, n: Int, word: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "shingle_hashes_pos"
  override protected def nullSafeEval(s: Any): Any =
    HashKernels.shingleHashesPos(s.asInstanceOf[UTF8String], n, word)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.HashKernels.shingleHashesPos($s, $n, $word)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Intersection size of two sorted long arrays. */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_size"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.sortedIntersectSize(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.sortedIntersectSize($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Column-level API. */
object hashes {
  private def expr(c: Column): Expression = GraftBridge.expression(c)
  private def col(e: Expression): Column = GraftBridge.column(e)

  def minhash_signature(hashedShingles: Column, numHashes: Int): Column =
    col(MinHashSignature(expr(hashedShingles), numHashes))

  def portable_minhash_signature(hashedShingles: Column, numHashes: Int): Column =
    col(PortableMinHashSignature(expr(hashedShingles), numHashes))

  def simhash64(hashedTokens: Column): Column =
    col(SimHash64(expr(hashedTokens)))

  def lsh_band_keys(sig: Column, bands: Int): Column =
    col(LshBandKeys(expr(sig), bands))

  def shingle_hashes(normText: Column, n: Int, word: Boolean): Column =
    col(ShingleHashes(expr(normText), n, word))

  def shingle_hashes_pos(normText: Column, n: Int, word: Boolean): Column =
    col(ShingleHashesPos(expr(normText), n, word))

  def sorted_intersect_size(a: Column, b: Column): Column =
    col(SortedIntersectSize(expr(a), expr(b)))

  def edit_segment_keys(s: Column, tau: Int): Column =
    col(EditSegmentKeys(expr(s), tau))

  def edit_probe_keys(s: Column, tau: Int): Column =
    col(EditProbeKeys(expr(s), tau))

  /** [[HashKernels.lehmer3]] as plain built-in Column arithmetic (pmod
    * + 3 multiply-mods — codegen'd, and textually mirrored by the
    * DuckDB oracles). */
  def lehmer3(x: Column): Column = {
    import org.apache.spark.sql.functions.{lit, pmod}
    val seeded = pmod(x, lit(2147483646L)) + lit(1L)
    (1 to 3).foldLeft(seeded)((acc, _) => pmod(acc * lit(48271L), lit(2147483647L)))
  }

  /** Portable 62-bit non-negative hash of a long: two [[lehmer3]]
    * streams (x and x + 700001) packed hi31 << 31 | lo31 — same
    * construction as the word hashes, mirrored by
    * PortableSql-rendering oracles. Feeds [[sketch.kmv_distinct]]. */
  def hash62(x: Column): Column = {
    import org.apache.spark.sql.functions.lit
    lehmer3(x) * lit(2147483648L) + lehmer3(x + lit(700001L))
  }
}
