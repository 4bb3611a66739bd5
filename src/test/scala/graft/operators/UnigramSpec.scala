package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

class UnigramSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def table(vocab: Seq[(String, Long)]) =
    TextStats.unigramTable(vocab.map { case (t, c) => (t, c, 0L) })

  test("viterbi equals brute force over all segmentations (tie order included)") {
    // vocab with deliberate cost structure and plenty of tie potential
    val vocab = Seq("a" -> 100L, "b" -> 100L, "c" -> 100L, "d" -> 100L,
      "ab" -> 200L, "bc" -> 200L, "cd" -> 200L, "abc" -> 250L,
      "abcd" -> 900L, "bcd" -> 260L)
    val t = table(vocab)
    val cost = vocab.toMap
    def bruteBest(w: String): (Long, Int, List[String]) = {
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(4, s.length)).flatMap { ln =>
          val tok = s.substring(0, ln)
          if (cost.contains(tok)) segs(s.substring(ln)).map(tok :: _) else Nil
        }
      // the tokenizer's documented order: (cost, ntok, toks lexicographic)
      implicit val ord: Ordering[(Long, Int, List[String])] =
        Ordering.Tuple3(Ordering.Long, Ordering.Int,
          Ordering.Implicits.seqOrdering[List, String])
      segs(w).map(sg => (sg.map(cost).sum, sg.length, sg)).min
    }
    for (w <- Seq("abcd", "abcabc", "dcba", "aabbccdd", "abcdabcd",
        "a", "abcdcbabcd")) {
      val got = t.segmentChunk(w).asScala.toList
      val want = bruteBest(w)._3
      assert(got == want, s"word $w")
      assert(got.mkString("") == w)
    }
  }

  test("randomized property: viterbi == brute force over 200 (vocab, word) draws") {
    // seeded generator — deterministic across runs; random costs are
    // drawn from a tiny range to force frequent exact ties, which is
    // where the (cost, ntok, lexicographic toks) order earns its keep
    val rnd = new scala.util.Random(0xC0FFEE)
    implicit val ord: Ordering[(Long, Int, List[String])] =
      Ordering.Tuple3(Ordering.Long, Ordering.Int,
        Ordering.Implicits.seqOrdering[List, String])
    for (trial <- 0 until 200) {
      val alphabet = "abcd".take(2 + rnd.nextInt(3))
      val singles = alphabet.map(c => c.toString -> (50L + rnd.nextInt(4)))
      def randTok(len: Int): String =
        (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      val multi = (0 until 2 + rnd.nextInt(6))
        .map(_ => randTok(2 + rnd.nextInt(3)) -> (60L + rnd.nextInt(5)))
      val vocab = (singles ++ multi).groupBy(_._1)
        .map { case (t, vs) => t -> vs.head._2 }.toSeq
      val cost = vocab.toMap
      val t = table(vocab)
      val w = randTok(1 + rnd.nextInt(9))
      def segs(s: String): Seq[List[String]] =
        if (s.isEmpty) Seq(Nil)
        else (1 to math.min(4, s.length)).flatMap { ln =>
          val tok = s.substring(0, ln)
          if (cost.contains(tok)) segs(s.substring(ln)).map(tok :: _) else Nil
        }
      val want = segs(w).map(sg => (sg.map(cost).sum, sg.length, sg)).min._3
      val got = t.segmentChunk(w).asScala.toList
      assert(got == want, s"trial $trial vocab=$vocab word=$w")
    }
  }

  test("equal-cost tie resolves to the lexicographically smaller token list") {
    // 'a'+'bc' and 'ab'+'c' both cost 300 with 2 tokens;
    // ['a','bc'] < ['ab','c'] because 'a' < 'ab'
    val t = table(Seq("a" -> 100L, "b" -> 100L, "c" -> 100L,
      "ab" -> 200L, "bc" -> 200L))
    assert(t.segmentChunk("abc").asScala.toList == List("a", "bc"))
  }

  test("words over the chunk cap segment as independent 16-char chunks") {
    val singles = ('a' to 'z').map(c => c.toString -> 100L)
    val t = table(singles ++ Seq("abcd" -> 150L, "efgh" -> 150L))
    // 20 chars: chunk 1 = first 16, chunk 2 = last 4 ("efgh" crosses
    // nothing — but "abcd" at positions 13..16 vs 17..20 must NOT merge
    // across the boundary)
    val w = "x" * 13 + "abcdefg" // length 20; "abcd" spans pos 14-17
    val got = t.segmentWord(w).asScala.toList
    assert(got.mkString("") == w)
    // boundary at 16: "abc" ends chunk 1 (as singles: a,b,c), "defg"
    // opens chunk 2 (d + efg singles; "efgh" absent, "abcd" split)
    assert(got.take(13) == List.fill(13)("x"))
    assert(!got.contains("abcd"))
  }

  test("train keeps every single char and prunes multi tokens deterministically") {
    val df = Seq.fill(50)("the cat sat on the mat").toDF("text")
    val vocab = TextStats.unigramTrain(df, "text", seedMulti = 8, rounds = 2)
    val singles = vocab.map(_._1).filter(_.length == 1).toSet
    assert(Set("t", "h", "e", "c", "a", "s", "o", "n", "m").subsetOf(singles))
    val multi = vocab.map(_._1).filter(_.length >= 2)
    // seed 8 multi -> ceil(2/3*8)=6 -> ceil(2/3*6)=4 after 2 rounds
    assert(multi.size == 4)
    // deterministic across re-runs
    val vocab2 = TextStats.unigramTrain(df, "text", seedMulti = 8, rounds = 2)
    assert(vocab == vocab2)
  }

  test("decode kernel inverts encode; corrupt multi-range id fails loudly") {
    val df = Seq((1L, "Round, trip! 42 times")).toDF("doc_id", "text")
    val t = TextStats.unigramTable(
      TextStats.unigramTrain(df, "text", seedMulti = 8, rounds = 2))
    val got = TextStats.unigramDecode(df, "doc_id", "text")
      .collect().head.getString(1)
    assert(got == "round,trip!42times")
    intercept[Exception] {
      import org.apache.spark.sql.functions.typedlit
      Seq(1).toDF("x").select(graft.functions.unigram.unigram_decode_ids(
        typedlit(Array(0x110000L + 9999L)), t)).collect()
    }
  }

  test("stored-and-reloaded vocabulary encodes bit-identically to fresh") {
    val df = Seq((1L, "the cat sat"), (2L, "a cat sat on the mat"))
      .toDF("doc_id", "text")
    val vocab = TextStats.unigramTrain(df, "text", seedMulti = 8, rounds = 2)
    val dir = java.nio.file.Files.createTempDirectory("uni_store").toString
    TextStats.saveUnigramModel(vocab, dir, spark)
    val loaded = TextStats.loadUnigramModel(spark, dir)
    assert(loaded.sortBy(_._1) == vocab.sortBy(_._1))
    val fresh = TextStats.unigramEncodeApply(df, "doc_id", "text",
      TextStats.unigramTable(vocab)).collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val stored = TextStats.unigramEncodeApply(df, "doc_id", "text",
      TextStats.unigramTable(loaded)).collect().map(r => (r.getLong(0), r.getString(2))).toMap
    assert(fresh == stored)
  }

  test("encode round-trips: decoded ids reproduce norm text minus spaces") {
    val df = Seq(
      (1L, "The cat, sat on 42 mats!"),
      (2L, "unigram tokenizers segment words"),
      (3L, "aaaa bbbb ccccddddeeeeffffgggghhhh")).toDF("doc_id", "text")
    val vocab = TextStats.unigramTrain(df, "text", seedMulti = 16, rounds = 2)
    val t = TextStats.unigramTable(vocab)
    val multiIds = vocab.map(_._1).filter(_.length >= 2).sorted
      .zipWithIndex.map { case (s, i) => (0x110000L + i, s) }.toMap
    val enc = TextStats.unigramEncodeApply(df, "doc_id", "text", t)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getString(2)))).toMap
    val rows = df.select(org.apache.spark.sql.functions.col("doc_id"),
        TextStats.norm(org.apache.spark.sql.functions.col("text")))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    rows.foreach { case (id, normText) =>
      val (nTok, ids) = enc(id)
      val idSeq = ids.split(" ").filter(_.nonEmpty).map(_.toLong)
      assert(idSeq.length == nTok)
      val decoded = idSeq.map { i =>
        if (i >= 0x110000L) multiIds(i) else new String(Character.toChars(i.toInt))
      }.mkString("")
      assert(decoded == normText.replace(" ", ""), s"doc $id")
    }
  }

  test("out-of-corpus chars encode as codepoints, never kill the batch") {
    // train on a corpus with NO q/x/7 anywhere, then apply the table
    // to documents that carry them (the streaming/out-of-corpus shape
    // of ADVICE r17) — each unseen char must cover itself (sentinel
    // cost) and encode as its codepoint; the rest of the word still
    // segments with the trained tokens
    val train = Seq((1L, "banana bandana cabana"), (2L, "banana banana"))
      .toDF("doc_id", "text")
    val vocab = TextStats.unigramTrain(train, "text", seedMulti = 8, rounds = 2)
    assert(!vocab.exists(v => v._1.contains("q") || v._1.contains("x") ||
      v._1.contains("7")))
    val t = TextStats.unigramTable(vocab)
    // kernel level: the unseen chars are their own tokens
    val toks = t.segmentWord("banqana").asScala.toList
    assert(toks.contains("q") && toks.mkString("") == "banqana", toks.toString)
    // frame level: encode survives and round-trips through decode
    val apply = Seq((10L, "ban7ana qx"), (11L, "banana")).toDF("doc_id", "text")
    val enc = TextStats.unigramEncodeApply(apply, "doc_id", "text", t)
      .collect().map(r => (r.getLong(0), r.getString(2))).toMap
    val ids10 = enc(10L).split(" ").map(_.toLong)
    assert(ids10.contains('7'.toLong) && ids10.contains('q'.toLong) &&
      ids10.contains('x'.toLong), ids10.mkString(","))
    import org.apache.spark.sql.functions.{col, typedlit}
    val dec = apply.select(col("doc_id"), graft.functions.unigram
        .unigram_decode_ids(graft.functions.unigram.unigram_encode_ids(
          TextStats.norm(col("text")), t), t).as("d"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(dec(10L) == "ban7anaqx" && dec(11L) == "banana", dec.toString)
  }
}
