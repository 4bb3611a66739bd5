package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Trained unigram-LM tokenizer table (the SentencePiece-shaped
  * companion to [[BpeTable]]): tokens with integer milli-log2 costs
  * (`cost(t) = l(N) - l(cnt(t))`, [[EntropyKernels.l]] fixed point, so
  * the whole tokenizer is oracle-replayable), segmented by exact
  * Viterbi — the min-cost segmentation under the lexicographic order
  * (total cost, token count, token list) — over `[a-z0-9]+` pretoken
  * chunks of at most [[graft.operators.TextStats.unigramChunkLen]]
  * chars. Token ids mirror the BPE scheme: single-char tokens ARE
  * their codepoint; multi-char tokens get 0x110000 + rank(token asc),
  * past the top of the Unicode space so the id stream stays injective.
  *
  * The tie-break triple matches SQL struct/list comparison semantics
  * verbatim (element-wise string compare, shorter-prefix-first), so a
  * DuckDB `min(struct)` DP produces the identical segmentation.
  *
  * Out-of-corpus coverage (ADVICE r17): a `[a-z0-9]` char absent from
  * the trained vocabulary — possible when the table is applied to a
  * frame the training corpus never saw (streaming, a new shard) —
  * covers itself as a single-char token at the sentinel
  * [[UnigramTable.UnseenCharCost]] and encodes as its codepoint (the
  * [[graft.functions.BpeTable]] fallback, same id scheme, so
  * [[decode]] round-trips it for free). The sentinel's magnitude is
  * immaterial to the segmentation: no vocabulary token can contain an
  * unseen char, so EVERY feasible path covers each unseen position
  * with exactly that one token and the relative (cost, ntok, toks)
  * order between paths is unchanged.
  */
final class UnigramTable(tok: Array[String], costs: Array[Long],
    maxTokenLen: Int, chunkLen: Int) extends Serializable {
  import UnigramTable.UnseenCharCost
  @transient private lazy val cost: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < tok.length) { m.put(tok(i), costs(i)); i += 1 }
    m
  }
  @transient private lazy val ids: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    val multi = tok.filter(_.length >= 2).sorted
    var i = 0
    while (i < multi.length) { m.put(multi(i), 0x110000L + i); i += 1 }
    var j = 0
    while (j < tok.length) {
      if (tok(j).length == 1) m.put(tok(j), tok(j).codePointAt(0).toLong)
      j += 1
    }
    m
  }

  /** (cost, ntok, toks) lexicographic compare — toks element-wise by
    * string with shorter-prefix-first, the SQL struct/list order. */
  private def better(c1: Long, n1: Int, t1: java.util.ArrayList[String],
      c2: Long, n2: Int, t2: java.util.ArrayList[String]): Boolean = {
    if (c1 != c2) return c1 < c2
    if (n1 != n2) return n1 < n2
    var i = 0
    val m = math.min(t1.size, t2.size)
    while (i < m) {
      val c = t1.get(i).compareTo(t2.get(i))
      if (c != 0) return c < 0
      i += 1
    }
    t1.size < t2.size
  }

  /** Exact Viterbi over one chunk (length <= chunkLen): min-cost
    * segmentation, deterministic under the documented tie order.
    * Always feasible: training keeps every corpus single char
    * unconditionally, and a char the training corpus never saw covers
    * itself at [[UnigramTable.UnseenCharCost]]. */
  def segmentChunk(w: String): java.util.ArrayList[String] = {
    val n = w.length
    val dpCost = new Array[Long](n + 1)
    val dpN = new Array[Int](n + 1)
    val dpT = new Array[java.util.ArrayList[String]](n + 1)
    dpT(0) = new java.util.ArrayList[String]()
    var j = 1
    while (j <= n) {
      var bc = 0L; var bn = 0; var bt: java.util.ArrayList[String] = null
      var len = 1
      val maxLen = math.min(maxTokenLen, j)
      while (len <= maxLen) {
        val t = w.substring(j - len, j)
        val c0 = cost.get(t)
        // unseen single char: feasible at the sentinel cost (scaladoc)
        val c: java.lang.Long =
          if (c0 == null && len == 1) UnseenCharCost else c0
        if (c != null && dpT(j - len) != null) {
          val cc = dpCost(j - len) + c.longValue
          val cn = dpN(j - len) + 1
          // compare (cost, ntok) BEFORE materializing the candidate's
          // token list — the list matters only on an exact tie, and
          // this runs per (position, length) in the per-row kernel
          val take =
            if (bt == null) true
            else if (cc != bc) cc < bc
            else if (cn != bn) cn < bn
            else {
              val ct = new java.util.ArrayList[String](dpT(j - len))
              ct.add(t)
              better(cc, cn, ct, bc, bn, bt)
            }
          if (take) {
            val ct = new java.util.ArrayList[String](dpT(j - len))
            ct.add(t)
            bc = cc; bn = cn; bt = ct
          }
        }
        len += 1
      }
      if (bt == null) throw new IllegalStateException(
        s"unigram Viterbi infeasible at '$w' pos $j — single-char token missing from vocabulary")
      dpCost(j) = bc; dpN(j) = bn; dpT(j) = bt
      j += 1
    }
    dpT(n)
  }

  /** Segment a full `[a-z0-9]+` word: chunk to `chunkLen`, Viterbi
    * each chunk, concatenate. */
  def segmentWord(w: String): java.util.ArrayList[String] = {
    if (w.length <= chunkLen) return segmentChunk(w)
    val out = new java.util.ArrayList[String]()
    var i = 0
    while (i < w.length) {
      out.addAll(segmentChunk(w.substring(i, math.min(i + chunkLen, w.length))))
      i += chunkLen
    }
    out
  }

  @transient private lazy val detok: java.util.HashMap[java.lang.Long, String] = {
    val m = new java.util.HashMap[java.lang.Long, String]()
    val it = ids.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); m.put(e.getValue, e.getKey) }
    m
  }

  /** Inverse of [[encode]] up to the dropped spaces ([[BpeTable
    * .decode]]'s contract): ids at or above 0x110000 resolve through
    * the vocabulary, everything below IS its codepoint (the scheme
    * keeps the ranges disjoint). An id in the multi-token range but
    * absent from the vocabulary is a corrupt stream — fail loudly. */
  def decode(idsIn: ArrayData): UTF8String = {
    val sb = new java.lang.StringBuilder()
    var i = 0
    val n = idsIn.numElements()
    while (i < n) {
      val id = idsIn.getLong(i)
      if (id >= 0x110000L) {
        val t = detok.get(id)
        if (t == null) throw new IllegalArgumentException(
          s"unigram decode: id $id not in vocabulary — stream/table mismatch")
        sb.append(t)
      } else sb.appendCodePoint(id.toInt)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Kernel for the training rounds: NORMALIZED word -> token array. */
  def segment(w: UTF8String): ArrayData = {
    val toks = segmentWord(w.toString)
    val arr = new Array[UTF8String](toks.size())
    var i = 0
    while (i < arr.length) { arr(i) = UTF8String.fromString(toks.get(i)); i += 1 }
    ArrayData.toArrayData(arr)
  }

  /** Document encode: normalized text -> token-id array. Alnum runs
    * chunk + Viterbi-segment; every other non-space mark is its own
    * codepoint token; spaces drop (the [[BpeTable.encode]] walk). */
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
        val toks = segmentWord(s.substring(start, i))
        var k = 0
        while (k < toks.size()) {
          val t = toks.get(k)
          val id = ids.get(t)
          if (id != null) out.add(id)
          // unseen single char IS its codepoint (the BpeTable
          // fallback; ids below 0x110000 are codepoints by scheme,
          // so decode round-trips it without a table entry)
          else if (t.length == 1) out.add(t.codePointAt(0).toLong)
          else throw new IllegalStateException(
            s"unigram token '$t' missing an id — table corrupt")
          k += 1
        }
      } else {
        out.add(cp.toLong)
        i += Character.charCount(cp)
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    ArrayData.toArrayData(arr)
  }
}

object UnigramTable {
  /** Sentinel milli-log2 cost of a single char the training corpus
    * never saw (≈ 2^-1e6 probability — unreachable by any real count,
    * so it reads as "unseen" in any dump). Shared verbatim by the
    * oracle generator's dp chain; see the class scaladoc for why its
    * magnitude cannot change any segmentation decision. Chunk length
    * is bounded (16), so sums stay far from Long/BIGINT overflow. */
  val UnseenCharCost: Long = 1000000000L
}

/** Word -> token array under a trained [[UnigramTable]] (the training
  * rounds' segmentation pass), one codegen call per row. */
case class UnigramSegment(child: Expression, table: UnigramTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_segment"
  override protected def nullSafeEval(s: Any): Any =
    table.segment(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table, classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, s => s"$ref.segment($s)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Normalized document -> token-id array under a trained
  * [[UnigramTable]] — the train-offline / tokenize-online kernel. */
case class UnigramEncodeIds(child: Expression, table: UnigramTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_encode_ids"
  override protected def nullSafeEval(s: Any): Any =
    table.encode(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table, classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, s => s"$ref.encode($s)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Unigram id-stream decode — the inverse of [[UnigramEncodeIds]] up
  * to the encoder's dropped spaces. */
case class UnigramDecodeIds(child: Expression, table: UnigramTable)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "unigram_decode_ids"
  override protected def nullSafeEval(a: Any): Any =
    table.decode(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramTable", table, classOf[UnigramTable].getName)
    defineCodeGen(ctx, ev, s => s"$ref.decode($s)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object unigram {
  def unigram_segment(word: Column, table: UnigramTable): Column =
    GraftBridge.column(UnigramSegment(GraftBridge.expression(word), table))
  def unigram_encode_ids(normText: Column, table: UnigramTable): Column =
    GraftBridge.column(UnigramEncodeIds(GraftBridge.expression(normText), table))
  def unigram_decode_ids(ids: Column, table: UnigramTable): Column =
    GraftBridge.column(UnigramDecodeIds(GraftBridge.expression(ids), table))
}
