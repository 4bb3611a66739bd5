package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE (the GPT-2/tiktoken family, third tokenizer family
  * after char-BPE [[BpeTable]] and unigram-LM [[UnigramTable]]):
  * pretokens are maximal non-space runs of the normalized text; each
  * pretoken becomes its UTF-8 BYTES mapped through the public GPT-2
  * byte-to-unicode table (every byte a printable single char), and the
  * exact char-BPE merge loop runs over that mapped alphabet. Any
  * input — non-Latin scripts, emoji, arbitrary punctuation — tokenizes
  * with zero OOV, which is why production stacks ship this family.
  *
  * Symbol encodings bracket each symbol with [[ByteBpe.SepL]] /
  * [[ByteBpe.SepR]] (chr 324/325): the char-BPE `(s1)(s2)` trick, but
  * '(' and ')' are themselves mapped bytes here, so the brackets move
  * just past the top of the mapped alphabet {33..126, 161..172,
  * 174..255, 256..323} where no symbol char can ever collide.
  */
object ByteBpe {
  val SepL = 'ń'
  val SepR = 'Ņ'

  /** The GPT-2 byte-to-unicode table (public knowledge — the GPT-2
    * encoder's bytes_to_unicode): the 188 "printable" bytes
    * {33..126, 161..172, 174..255} map to their own codepoint; the
    * remaining 68 map to 256 + rank, in byte order. Deterministic,
    * bijective, and identical to the oracle's literal b2u table. */
  val byteToChar: Array[Char] = {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (printable(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }

  /** Inverse: mapped-char codepoint -> byte value (-1 = not a mapped
    * char; hitting it means a corrupt token stream). */
  val charToByte: Array[Int] = {
    val out = Array.fill(326)(-1)
    var b = 0
    while (b < 256) { out(byteToChar(b).toInt) = b; b += 1 }
    out
  }

  /** A pretoken as its bracketed mapped-byte symbol encoding
    * `⟨m1⟩⟨m2⟩…` — the trainer's row kernel (one merge = one literal
    * string replace, left-to-right non-overlapping in both Spark and
    * the SQL oracle). */
  def syms(w: UTF8String): UTF8String = {
    val bytes = w.getBytes
    val sb = new java.lang.StringBuilder(bytes.length * 3)
    var i = 0
    while (i < bytes.length) {
      sb.append(SepL).append(byteToChar(bytes(i) & 0xff)).append(SepR)
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Serializable byte-level BPE apply table — [[BpeTable]]'s contract
  * over the mapped-byte alphabet. Ids: a single mapped char IS its
  * codepoint (33..323, disjoint from real text only in the decoder's
  * eyes — the stream is self-describing because merge ids sit at
  * 0x110000 + round, past every codepoint); [[decode]] re-assembles
  * the mapped chars of ALL tokens into one byte buffer BEFORE UTF-8
  * decoding, so a multibyte char split across token boundaries
  * round-trips exactly. */
final class ByteBpeTable(lhs: Array[String], rhs: Array[String],
    tok: Array[String], idsArr: Array[Long]) extends Serializable {
  import ByteBpe._

  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    var i = 0
    while (i < tok.length) { m.put(tok(i), idsArr(i)); i += 1 }
    m
  }
  @transient private lazy val detok: java.util.HashMap[java.lang.Long, String] = {
    val m = new java.util.HashMap[java.lang.Long, String]()
    var i = 0
    while (i < tok.length) { m.put(idsArr(i), tok(i)); i += 1 }
    m
  }

  /** Normalized text -> token-id array: split on the single spaces
    * norm guarantees, map each pretoken to mapped-byte symbols, apply
    * each merge left-to-right non-overlapping in rank order, emit ids.
    * Total on ANY input — every byte has a mapped char. */
  def encode(text: UTF8String): ArrayData = {
    val s = text.toString
    val out = new java.util.ArrayList[java.lang.Long]()
    var i = 0
    val n = s.length
    while (i < n) {
      if (s.charAt(i) == ' ') i += 1
      else {
        val start = i
        while (i < n && s.charAt(i) != ' ') i += 1
        encodeWord(s.substring(start, i), out)
      }
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j); j += 1 }
    ArrayData.toArrayData(arr)
  }

  private def encodeWord(w: String, out: java.util.ArrayList[java.lang.Long]): Unit = {
    val bytes = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var syms = new java.util.ArrayList[String](bytes.length)
    var i = 0
    while (i < bytes.length) {
      syms.add(String.valueOf(byteToChar(bytes(i) & 0xff)))
      i += 1
    }
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
          s"byte-BPE symbol '$t' missing from vocabulary — merge table corrupt")
        out.add(id)
      }
      k += 1
    }
  }

  /** Inverse of [[encode]] up to the dropped spaces: gather every
    * token's mapped chars, invert the byte table into ONE buffer,
    * UTF-8 decode the whole (token boundaries may split a multibyte
    * char — decoding per-token would be wrong). Corrupt streams fail
    * loudly: unknown merge-range id, or a char outside the mapped
    * alphabet. */
  def decode(idsIn: ArrayData): UTF8String = {
    val chars = new java.lang.StringBuilder()
    var i = 0
    val n = idsIn.numElements()
    while (i < n) {
      val id = idsIn.getLong(i)
      if (id >= 0x110000L) {
        val t = detok.get(id)
        if (t == null) throw new IllegalArgumentException(
          s"byte-BPE decode: id $id not in vocabulary — stream/table mismatch")
        chars.append(t)
      } else chars.append(id.toInt.toChar)
      i += 1
    }
    val bytes = new Array[Byte](chars.length)
    var j = 0
    while (j < bytes.length) {
      val c = chars.charAt(j).toInt
      val b = if (c < charToByte.length) charToByte(c) else -1
      if (b < 0) throw new IllegalArgumentException(
        s"byte-BPE decode: char U+${c.toHexString} outside the mapped alphabet")
      bytes(j) = b.toByte
      j += 1
    }
    UTF8String.fromBytes(bytes)
  }
}

/** Pretoken -> bracketed mapped-byte symbol string (the byte-BPE
  * trainer's per-row kernel). */
case class ByteBpeSyms(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_bpe_syms"
  override protected def nullSafeEval(s: Any): Any =
    ByteBpe.syms(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s => s"graft.functions.ByteBpe.syms($s)")
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Normalized document -> byte-BPE token-id array under a trained
  * [[ByteBpeTable]] — the train-offline / tokenize-online kernel. */
case class ByteBpeEncodeIds(child: Expression, table: ByteBpeTable)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_bpe_encode_ids"
  override protected def nullSafeEval(s: Any): Any =
    table.encode(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeTable", table, classOf[ByteBpeTable].getName)
    defineCodeGen(ctx, ev, s => s"$ref.encode($s)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Byte-BPE id-stream decode — the inverse of [[ByteBpeEncodeIds]] up
  * to the encoder's dropped spaces. */
case class ByteBpeDecodeIds(child: Expression, table: ByteBpeTable)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "byte_bpe_decode_ids"
  override protected def nullSafeEval(a: Any): Any =
    table.decode(a.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("byteBpeTable", table, classOf[ByteBpeTable].getName)
    defineCodeGen(ctx, ev, s => s"$ref.decode($s)")
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object bbpe {
  def byte_bpe_syms(word: Column): Column =
    GraftBridge.column(ByteBpeSyms(GraftBridge.expression(word)))
  def byte_bpe_encode_ids(normText: Column, table: ByteBpeTable): Column =
    GraftBridge.column(ByteBpeEncodeIds(GraftBridge.expression(normText), table))
  def byte_bpe_decode_ids(ids: Column, table: ByteBpeTable): Column =
    GraftBridge.column(ByteBpeDecodeIds(GraftBridge.expression(ids), table))
}
