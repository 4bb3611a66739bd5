package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{ByteBpe, ByteBpeTable}

class ByteBpeSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("GPT-2 byte-to-unicode table: bijective, printables fixed, rest at 256+rank") {
    val printable = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    assert(ByteBpe.byteToChar.length == 256)
    for (b <- 0 until 256) {
      val c = ByteBpe.byteToChar(b).toInt
      if (printable(b)) assert(c == b, s"byte $b must map to itself")
      else assert(c >= 256 && c <= 323, s"byte $b -> $c outside 256..323")
      assert(ByteBpe.charToByte(c) == b, s"inverse broken at byte $b")
    }
    assert(ByteBpe.byteToChar.distinct.length == 256, "table not injective")
    // the 68 non-printables get 256.. in byte order: 0 -> 256, 32 (space)
    // -> 288 ('Ġ' in GPT-2 lore), 127 -> 289
    assert(ByteBpe.byteToChar(0).toInt == 256)
    assert(ByteBpe.byteToChar(32).toInt == 288)
    assert(ByteBpe.byteToChar(127).toInt == 289)
    // brackets sit just past the alphabet top
    assert(ByteBpe.SepL.toInt == 324 && ByteBpe.SepR.toInt == 325)
  }

  test("syms brackets each mapped byte; multibyte chars expand to their UTF-8 bytes") {
    import org.apache.spark.unsafe.types.UTF8String
    val s = ByteBpe.syms(UTF8String.fromString("a€")).toString
    // 'a' = 0x61 maps to itself; '€' = E2 82 AC maps through 256+ ranks
    val syms = s.substring(1, s.length - 1)
      .split(s"${ByteBpe.SepR}${ByteBpe.SepL}").toSeq
    assert(syms.length == 4 && syms.head == "a", syms.toString)
    val back = syms.map(t => ByteBpe.charToByte(t.codePointAt(0)).toByte)
    assert(new String(back.toArray, java.nio.charset.StandardCharsets.UTF_8) == "a€")
  }

  test("train learns multibyte merges; encode/decode round-trips across scripts") {
    val df = Seq(
      (1L, "日本 日本 日本 tokyo"),
      (2L, "Привет мир Привет"),
      (3L, "hello hello world!"),
      (4L, "emoji 😀 twice 😀")).toDF("doc_id", "text")
    val merges = TextStats.byteBpeTrainMerges(df, "text", rounds = 10)
    assert(merges.nonEmpty && merges.size <= 10)
    val t = TextStats.byteBpeTable(merges)
    val dec = TextStats.byteBpeDecode(df, "doc_id", "text", rounds = 10)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    val norms = df.select(org.apache.spark.sql.functions.col("doc_id"),
        TextStats.norm(org.apache.spark.sql.functions.col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    for ((id, n) <- norms)
      assert(dec(id) == n.replace(" ", ""), s"doc $id: ${dec(id)} != $n")
    // a merge learned INSIDE a multibyte char (the repeated CJK/emoji
    // bytes dominate pair counts) — token boundaries split chars and
    // the round-trip above only holds if decode reassembles bytes
    // before UTF-8 decoding
    val multiByteMerge = merges.exists { case (a, b) =>
      (a + b).exists(_ >= 0x100) }
    assert(multiByteMerge, s"no multibyte merge learned in $merges")
  }

  test("zero OOV: any input encodes; corrupt id stream fails loudly") {
    val merges = TextStats.byteBpeTrainMerges(
      Seq((1L, "aa aa")).toDF("doc_id", "text"), "text", rounds = 2)
    val t = TextStats.byteBpeTable(merges)
    // junk the trainer never saw — tabs collapse via norm, the rest is
    // bytes all the way down
    val out = TextStats.byteBpeEncodeApply(
      Seq((9L, "zzz 中文 ÿ¡ %$#@")).toDF("doc_id", "text"),
      "doc_id", "text", t).collect()
    assert(out.length == 1 && out(0).getLong(1) > 0)
    import org.apache.spark.sql.functions.typedlit
    // constant folding may evaluate the corrupt stream on the driver
    // (IllegalArgumentException) or in a task (SparkException wrapper)
    val ex = intercept[Throwable] {
      Seq(1).toDF("x").select(graft.functions.bbpe.byte_bpe_decode_ids(
        typedlit(Array(0x110000L + 9999L)), t)).collect()
    }
    assert(Iterator.iterate(ex)(_.getCause).takeWhile(_ != null).take(5)
      .exists(e => e.getMessage != null
        && e.getMessage.contains("not in vocabulary")), ex.toString)
  }

  test("randomized property: round-trip over arbitrary unicode, 120 draws") {
    // seeded generator; codepoints drawn across ASCII, Latin-1, BMP
    // scripts, and the supplementary planes (emoji land as surrogate
    // PAIRS in the JVM string — the byte path must treat them as one
    // 4-byte UTF-8 char). decode(encode(norm)) == norm minus spaces
    // must hold for EVERY valid input under EVERY trained table.
    val rnd = new scala.util.Random(0xBEEF)
    def randCp(): Int = rnd.nextInt(4) match {
      case 0 => 0x21 + rnd.nextInt(0x5e)            // ASCII printable
      case 1 => 0xa1 + rnd.nextInt(0x15f)           // Latin-1/ext
      case 2 => Seq(0x400, 0x600, 0x4e00, 0xac00)(rnd.nextInt(4)) +
        rnd.nextInt(0x80)                           // Cyr/Arab/CJK/Hangul
      case _ => 0x1f300 + rnd.nextInt(0x200)        // supplementary (emoji)
    }
    def randText(): String = (0 until 1 + rnd.nextInt(4)).map { _ =>
      val sb = new java.lang.StringBuilder()
      for (_ <- 0 until 1 + rnd.nextInt(8)) sb.appendCodePoint(randCp())
      sb.toString
    }.mkString(" ")
    import org.apache.spark.unsafe.types.UTF8String
    for (trial <- 0 until 120) {
      val corpus = Seq.fill(3)((rnd.nextLong(), randText()))
        .toDF("doc_id", "text")
      val t = TextStats.byteBpeTable(
        TextStats.byteBpeTrainMerges(corpus, "text", rounds = 1 + trial % 6))
      val probe = TextStats.norm(org.apache.spark.sql.functions.lit(randText()))
      val normed = Seq(1).toDF("x").select(probe.as("n"))
        .collect()(0).getString(0)
      val ids = t.encode(UTF8String.fromString(normed))
      val back = t.decode(ids).toString
      assert(back == normed.replace(" ", ""),
        s"trial $trial: '$back' != '${normed.replace(" ", "")}'")
    }
  }

  test("trainer is deterministic and matches the greedy LTR replace semantics") {
    val df = Seq((1L, "abab abab ababab")).toDF("doc_id", "text")
    val m1 = TextStats.byteBpeTrainMerges(df, "text", rounds = 3)
    val m2 = TextStats.byteBpeTrainMerges(df, "text", rounds = 3)
    assert(m1 == m2)
    // first merge must be the most frequent adjacent pair: ('a','b')
    assert(m1.head == ("a", "b"), m1.toString)
    val t = TextStats.byteBpeTable(m1)
    val enc = TextStats.byteBpeEncodeApply(df, "doc_id", "text", t)
      .collect()(0).getString(2).split(" ").map(_.toLong)
    // 'ab' merged greedily left-to-right: "ababab" -> ab|ab|ab (or
    // further-merged pairs) — no raw 'a'/'b' codepoints survive
    assert(!enc.contains('a'.toLong) && !enc.contains('b'.toLong),
      enc.mkString(","))
  }

  test("gated-collect driver trainer is bit-identical to the distributed loop (two merge counts)") {
    // multi-script corpus with deliberate tie-break pressure: repeated
    // equal-count pairs, a prefix-pair pair ("x","y") vs ("xy","z")
    // after the first merge, and multibyte symbols
    val df = Seq(
      (1L, "xyz xyz xyz xyzw"),
      (2L, "日本 日本 日本語 tokyo"),
      (3L, "Привет мир Привет мир"),
      (4L, "abab abab ababab cd cd"),
      (5L, "emoji 😀 twice 😀 thrice 😀")).toDF("doc_id", "text")
    for (r <- Seq(8, 64)) {
      val dist = TextStats.byteBpeTrainMerges(df, "text", rounds = r)
      val local = TextStats.byteBpeTrainMergesLocal(df, "text", rounds = r)
      assert(local == dist,
        s"rounds=$r diverged at merge ${local.zip(dist).indexWhere(p => p._1 != p._2)}: " +
          s"local=${local.take(12)} dist=${dist.take(12)}")
    }
    // the type-table gate fails loudly naming the dial — and it fires
    // off a bounded count probe BEFORE any driver collect (ADVICE r19:
    // the gate must protect driver memory, not report after the OOM)
    val ex = intercept[IllegalArgumentException] {
      TextStats.byteBpeTrainMergesLocal(df, "text", rounds = 2, maxTypes = 3)
    }
    assert(ex.getMessage.contains("maxTypes"))
    // the Auto form falls back to the distributed loop above the gate
    // instead of throwing, and the fallback is transparent
    // (bit-identical merges)
    val auto = TextStats.byteBpeTrainMergesAuto(
      df, "text", rounds = 8, maxTypes = 3)
    assert(auto == TextStats.byteBpeTrainMerges(df, "text", rounds = 8))
    // below the gate Auto takes the driver loop and still agrees
    assert(TextStats.byteBpeTrainMergesAuto(df, "text", rounds = 8) ==
      TextStats.byteBpeTrainMergesLocal(df, "text", rounds = 8))
  }
}
