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

  /** Byte offsets of word starts in a NORMALIZED (single-space) string,
    * with a sentinel so `end(j) = starts(j+1) - 1`. Shared scan for the
    * word-gram kernels. */
  private def wordStarts(base: AnyRef, off: Long, numBytes: Int): Array[Int] = {
    var numWords = 1
    var i = 0
    while (i < numBytes) {
      if (Platform.getByte(base, off + i) == ' ') numWords += 1
      i += 1
    }
    val starts = new Array[Int](numWords + 2)
    starts(0) = 0
    var w = 1
    i = 0
    while (i < numBytes) {
      if (Platform.getByte(base, off + i) == ' ') { starts(w) = i + 1; w += 1 }
      i += 1
    }
    starts(numWords) = numBytes + 1 // sentinel
    starts(numWords + 1) = numWords // word count rides in the last slot
    starts
  }

  /** Every word n-gram occurrence (NOT distinct) of a normalized string,
    * as strings — each gram is a contiguous byte slice, so this is one
    * boundary scan + m copies, replacing the interpreted SQL-lambda
    * chain `transform(sequence(...), i -> concat_ws(' ', slice(split(t,
    * ' '), i+1, n)))` whose inner split re-evaluates per element.
    * Fewer than n words degenerates to one whole-string gram (same as
    * the `slice` semantics of the SQL form). */
  def wordNgrams(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val numBytes = s.numBytes()
    val starts = wordStarts(base, off, numBytes)
    val numWords = starts(starts.length - 1)
    val m = math.max(numWords - n + 1, 1)
    val out = new Array[UTF8String](m)
    var j = 0
    while (j < m) {
      val from = starts(j)
      val to = starts(math.min(j + n, numWords)) - 1
      val bytes = new Array[Byte](to - from)
      Platform.copyMemory(base, off + from, bytes, Platform.BYTE_ARRAY_OFFSET, to - from)
      out(j) = UTF8String.fromBytes(bytes)
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** xxhash64 (seed 42 — SQL xxhash64) of each word of a normalized
    * string, in order, non-distinct: the token-hash array the simhash
    * fold consumes, without materializing word strings. Bit-identical
    * to `transform(split(t, ' '), w -> xxhash64(w))`. */
  def wordHashes(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val numBytes = s.numBytes()
    val starts = wordStarts(base, off, numBytes)
    val numWords = starts(starts.length - 1)
    val out = new Array[Long](numWords)
    var j = 0
    while (j < numWords) {
      val from = starts(j)
      val to = starts(j + 1) - 1
      out(j) = org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(base, off + from, to - from, 42L)
      j += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Cross-engine-portable 62-bit word hashes: per word, two
    * independent polynomial folds over code points (multiplier 48271
    * mod 2^31-1 and 16807 mod 2147483629), each avalanched by
    * [[HashKernels.lehmer3]], packed as hi31 << 31 | lo31. All
    * arithmetic fits 47 bits, so a DuckDB list_reduce over
    * ord(code point) reproduces every hash bit-for-bit — the token
    * hash family behind the oracle-verified simhash path (the faster
    * xxhash64 [[wordHashes]] stays for the ground-truth-checked
    * minhash path). Splits on single spaces like string_split, so the
    * word list matches the SQL side on normalized text. */
  def wordPortableHashes(s: UTF8String): ArrayData = {
    // ASCII fast path (the normalized-corpus common case): code point
    // == byte, so the two folds run over the raw bytes with no string
    // materialization. Identical output to the code-point path.
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var i = 0
    while (i < nb) {
      if (Platform.getByte(base, off + i) < 0)
        return wordPortableHashesGeneric(s)
      i += 1
    }
    var words = 1
    i = 0
    while (i < nb) {
      if (Platform.getByte(base, off + i) == ' ') words += 1
      i += 1
    }
    val out = new Array[Long](words)
    var w = 0
    var h1 = 0L
    var h2 = 0L
    i = 0
    while (i <= nb) {
      val b = if (i == nb) ' ' else Platform.getByte(base, off + i) // sentinel
      if (b == ' ') {
        out(w) = (HashKernels.lehmer3(h1) << 31) | HashKernels.lehmer3(h2)
        w += 1; h1 = 0L; h2 = 0L
      } else {
        h1 = (h1 * 48271L + b) % 2147483647L
        h2 = (h2 * 16807L + b) % 2147483629L
      }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Code-point path for non-ASCII input — the semantic definition
    * (ord(code point), matching DuckDB's ord()). */
  private def wordPortableHashesGeneric(s: UTF8String): ArrayData = {
    val words = s.toString.split(" ", -1)
    val out = new Array[Long](words.length)
    var w = 0
    while (w < words.length) {
      val word = words(w)
      var h1 = 0L
      var h2 = 0L
      var i = 0
      while (i < word.length) {
        val c = word.codePointAt(i)
        h1 = (h1 * 48271L + c) % 2147483647L
        h2 = (h2 * 16807L + c) % 2147483629L
        i += Character.charCount(c)
      }
      out(w) = (HashKernels.lehmer3(h1) << 31) | HashKernels.lehmer3(h2)
      w += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Portable 62-bit hash of a WHOLE string, spaces included — the
    * same two folds + lehmer3 packing as [[wordPortableHashes]], but
    * never split: DuckDB's `wordHash` rendering over the full string
    * replays it exactly. Content-addressed chunk identity for CDC
    * dedup. */
  /** NFD-decompose and drop combining marks (see [[FoldAccents]]).
    * ASCII fast path returns the input UTF8String itself. */
  def foldAccents(s: UTF8String): UTF8String = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < nb) {
      if (Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val nfd = java.text.Normalizer.normalize(s.toString,
      java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    var j = 0
    while (j < nfd.length) {
      // codepoint iteration: a supplementary combining mark read as
      // two chars would type as SURROGATE and slip through
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK)
        sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  def stringPortableHash(s: UTF8String): Long = {
    val str = s.toString
    var h1 = 0L
    var h2 = 0L
    var i = 0
    while (i < str.length) {
      val c = str.codePointAt(i)
      h1 = (h1 * 48271L + c) % 2147483647L
      h2 = (h2 * 16807L + c) % 2147483629L
      i += Character.charCount(c)
    }
    (HashKernels.lehmer3(h1) << 31) | HashKernels.lehmer3(h2)
  }

  /** Portable hash of every length-`n` code-point gram of the RAW text
    * (spaces are ordinary code points here, unlike the word hashes):
    * the same two polynomial folds + lehmer3 packing as
    * [[wordPortableHashes]], so DuckDB replays each value with the
    * identical `wordHash` rendering over a code-point slice. One hash
    * per start position, document order; fewer than `n` code points
    * yields an empty array (no gram, no cut). */
  def charGramPortableHashes(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nb = s.numBytes()
    var ascii = true
    var i = 0
    while (ascii && i < nb) {
      if (Platform.getByte(base, off + i) < 0) ascii = false
      i += 1
    }
    val cps: Array[Int] =
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
    val m = cps.length - n + 1
    if (m <= 0) ArrayData.toArrayData(Array.emptyLongArray)
    else {
      val out = new Array[Long](m)
      var p = 0
      while (p < m) {
        var h1 = 0L
        var h2 = 0L
        var j = 0
        while (j < n) {
          val c = cps(p + j)
          h1 = (h1 * 48271L + c) % 2147483647L
          h2 = (h2 * 16807L + c) % 2147483629L
          j += 1
        }
        out(p) = (HashKernels.lehmer3(h1) << 31) | HashKernels.lehmer3(h2)
        p += 1
      }
      ArrayData.toArrayData(out)
    }
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

/** All word n-gram occurrences (non-distinct) of a normalized text column. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "n-gram length must be positive")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.wordNgrams(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.wordNgrams($s, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** xxhash64 of each word of a normalized text column. */
case class WordHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_hashes"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.wordHashes(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.wordHashes($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Portable 62-bit hash of each word ([[TextKernels.wordPortableHashes]]). */
case class WordPortableHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_portable_hashes"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.wordPortableHashes(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.wordPortableHashes($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Portable 62-bit hash of every length-`n` code-point gram, one per
  * start position in document order ([[TextKernels.charGramPortableHashes]]) —
  * the content-defined-chunking boundary source. */
case class CharGramPortableHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram length must be positive")
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_gram_portable_hashes"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.charGramPortableHashes(s.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.charGramPortableHashes($s, $n)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Serializable BPE apply table: rank-ordered merges plus the
  * token-string -> id vocabulary (single-char symbols id by
  * codepoint). One `encode` call tokenizes a whole normalized
  * document — pretokenize ([a-z0-9]+ runs merge; any other non-space
  * code point is a single one-codepoint token), apply each merge
  * left-to-right non-overlapping per word (exactly the literal
  * `replace` semantics of the training loop and the SQL oracle), map
  * to ids. A codegen'd reference object: the per-element lambda form
  * of this evaluates interpreted and measured ~7x slower. */
final class BpeTable(lhs: Array[String], rhs: Array[String],
    tok: Array[String], ids: Array[Long]) extends Serializable {
  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < tok.length) { m.put(tok(i), ids(i)); i += 1 }
    m
  }
  @transient private lazy val detok: java.util.HashMap[java.lang.Long, String] = {
    val m = new java.util.HashMap[java.lang.Long, String]()
    var i = 0
    while (i < tok.length) { m.put(ids(i), tok(i)); i += 1 }
    m
  }

  /** Inverse of [[encode]] up to the dropped spaces: merge-range ids
    * (>= 0x110000) resolve through the vocabulary, everything else IS
    * its codepoint (the id scheme keeps the ranges disjoint). An id
    * in the merge range but absent from the vocabulary is a corrupt
    * stream — fail loudly, never skip. */
  def decode(idsIn: org.apache.spark.sql.catalyst.util.ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = idsIn.numElements()
    while (i < n) {
      val id = idsIn.getLong(i)
      if (id >= 0x110000L) {
        val t = detok.get(id)
        if (t == null) throw new IllegalArgumentException(
          s"BPE decode: id $id not in vocabulary — stream/table mismatch")
        sb.append(t)
      } else sb.appendCodePoint(id.toInt)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def encode(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (cp == ' ') i += 1
      else if ((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9')) {
        val start = i
        while (i < n && {
          val c = s.charAt(i)
          (c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')
        }) i += 1
        encodeWord(s.substring(start, i), out)
      } else {
        out.add(cp.toLong) // single-codepoint mark token
        i += Character.charCount(cp)
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    ArrayData.toArrayData(arr)
  }

  private def encodeWord(w: String, out: java.util.ArrayList[java.lang.Long]): Unit = {
    var syms = new java.util.ArrayList[String](w.length)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    var r = 0
    while (r < lhs.length) {
      val a = lhs(r); val b = rhs(r)
      var j = 0
      val next = new java.util.ArrayList[String](syms.size())
      while (j < syms.size()) {
        if (j + 1 < syms.size() && syms.get(j) == a && syms.get(j + 1) == b) {
          next.add(a + b); j += 2 // greedy left-to-right, non-overlapping
        } else { next.add(syms.get(j)); j += 1 }
      }
      syms = next
      r += 1
    }
    var k = 0
    while (k < syms.size()) {
      val t = syms.get(k)
      if (t.length == 1) out.add(t.codePointAt(0).toLong)
      else {
        val id = vocab.get(t)
        if (id == null) throw new IllegalStateException(
          s"BPE symbol '$t' missing from vocabulary — merge table corrupt")
        out.add(id)
      }
      k += 1
    }
  }
}

/** BPE document encoding through a trained [[BpeTable]]: normalized
  * text -> array of token ids, one kernel call per row. */
case class BpeEncodeIds(child: Expression, table: BpeTable)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_encode_ids"
  override protected def nullSafeEval(s: Any): Any =
    table.encode(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, s => s"$ref.encode($s)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** BPE id-stream decode through a trained [[BpeTable]] — the inverse
  * of [[BpeEncodeIds]] up to the encoder's dropped spaces. */
case class BpeDecodeIds(child: Expression, table: BpeTable)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bpe_decode_ids"
  override protected def nullSafeEval(a: Any): Any =
    table.decode(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeTable", table, classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, s => s"$ref.decode($s)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Whole-string portable hash ([[TextKernels.stringPortableHash]]). */
case class StringPortableHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "string_portable_hash"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.stringPortableHash(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.stringPortableHash($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Accent folding: Unicode NFD decomposition with every combining
  * mark (category Mn) dropped — 'café' -> 'cafe', 'ñ' -> 'n'. The
  * canonical-equivalence fold a dedup key needs so 'café' (NFC) and
  * 'café' (NFD) and 'cafe' all collapse. Mirrors DuckDB's
  * `strip_accents` on Latin scripts (both reduce to the base letter);
  * scripts where stripping marks is lossy (Hangul jamo, Indic matras)
  * are out of contract for the dedup KEY — the key only groups, the
  * stored text is never rewritten. ASCII strings return the input
  * object unchanged (no allocation — the overwhelmingly common path
  * in a web corpus). */
case class FoldAccents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "fold_accents"
  override protected def nullSafeEval(s: Any): Any =
    TextKernels.foldAccents(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.TextKernels.foldAccents($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object text {
  def fold_accents(rawText: Column): Column =
    GraftBridge.column(FoldAccents(GraftBridge.expression(rawText)))
  def char_gram_portable_hashes(rawText: Column, n: Int): Column =
    GraftBridge.column(CharGramPortableHashes(GraftBridge.expression(rawText), n))
  def string_portable_hash(rawText: Column): Column =
    GraftBridge.column(StringPortableHash(GraftBridge.expression(rawText)))
  def bpe_encode_ids(normText: Column, table: BpeTable): Column =
    GraftBridge.column(BpeEncodeIds(GraftBridge.expression(normText), table))
  def chunk_words(normText: Column, k: Int): Column =
    GraftBridge.column(ChunkWords(GraftBridge.expression(normText), k))
  def word_ngrams(normText: Column, n: Int): Column =
    GraftBridge.column(WordNgrams(GraftBridge.expression(normText), n))
  def word_hashes(normText: Column): Column =
    GraftBridge.column(WordHashes(GraftBridge.expression(normText)))
  def word_portable_hashes(normText: Column): Column =
    GraftBridge.column(WordPortableHashes(GraftBridge.expression(normText)))
  def kn_score(normText: Column, table: KnLmTable): Column =
    GraftBridge.column(KnScore(GraftBridge.expression(normText), table))
  def bpe_decode_ids(ids: Column, table: BpeTable): Column =
    GraftBridge.column(BpeDecodeIds(GraftBridge.expression(ids), table))
}
