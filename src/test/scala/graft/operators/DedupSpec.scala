package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  test("exactDedup groups normalized variants under the smallest id") {
    val d = docs(
      1L -> "Hello   World",
      2L -> "hello world",
      3L -> "  HELLO WORLD  ",
      4L -> "something else")
    val got = Dedup.exactDedup(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 3L), (4L, 1L)))
  }

  test("unicodeDedup: accent / case / NFC-vs-NFD variants share one key") {
    val nfcCafe = "caf\u00e9 latte"        // e precomposed
    val nfdCafe = "cafe\u0301 latte"       // e + combining acute
    val d = docs(
      1L -> nfcCafe,
      2L -> nfdCafe,
      3L -> "CAFE LATTE",
      4L -> "caf\u00e9   LATTE ",
      5L -> "ni\u00f1o",
      6L -> "nino",
      7L -> "unrelated")
    val got = Dedup.unicodeDedup(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 4L), (5L, 2L), (7L, 1L)))
  }

  test("foldAccents: ASCII passthrough, supplementary marks stripped") {
    import org.apache.spark.sql.functions.col
    val d = docs(
      1L -> "plain ascii",
      2L -> "a\u0301",                     // a + combining acute
      3L -> ("x" + new String(Character.toChars(0x1D167)) + "y"))
    val got = d.select(graft.functions.text.fold_accents(col("text")))
      .collect().map(_.getString(0))
    assert(got(0) == "plain ascii")
    assert(got(1) == "a")
    // U+1D167 (combining tremolo, category Mn) is stripped whole
    assert(got(2) == "xy")
  }

  test("word shingles of a short text") {
    val d = docs(1L -> "a b c d")
    val sh = Dedup.withShingles(d, "doc_id", "text", 3, word = true)
      .select("shingles").head().getSeq[String](0).toSet
    assert(sh == Set("a b c", "b c d"))
  }

  test("char shingles shorter than n give one truncated shingle") {
    val d = docs(1L -> "ab")
    val sh = Dedup.withShingles(d, "doc_id", "text", 5, word = false)
      .select("shingles").head().getSeq[String](0)
    assert(sh == Seq("ab"))
  }

  test("native shingle hashes == sorted distinct xxhash64 of the shingle strings") {
    import org.apache.spark.sql.functions.{col, expr}
    val d = docs(
      1L -> "The quick brown fox jumps over the  LAZY dog",
      2L -> "ab",
      3L -> "",
      4L -> "héllo wörld ünïcode téxt hère",
      5L -> "one two one two one two") // duplicate shingles
    for ((n, word) <- Seq((3, true), (1, true), (5, false), (2, false))) {
      val viaStrings = Dedup.withShingles(d, "doc_id", "text", n, word)
        .select(col("doc_id"),
          expr("array_sort(array_distinct(transform(shingles, s -> xxhash64(s))))").as("h"))
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
      val viaKernel = Dedup.hashedShingles(d, "doc_id", "text", n, word)
        .collect().map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
      assert(viaKernel == viaStrings, s"n=$n word=$word")
    }
  }

  test("minhashNearDups finds planted near-dup and nothing else") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w7", "x7") // 1 token changed of 40
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val d = docs(1L -> base, 2L -> nearDup, 3L -> other)
    val pairs = Dedup.minhashNearDups(d, "doc_id", "text",
      shingleLen = 3, wordShingles = true, numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    // 3 changed shingles of 38 => J = 35/41
    assert(math.abs(pairs.head._3 - 35.0 / 41.0) < 1e-12)
  }

  test("lsh bucket cap drops only the pathological duplicate cluster") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearDup = base.replace("w7", "x7")
    val boiler = (1 to 40).map(i => s"b$i").mkString(" ")
    // 20 exact copies of the boilerplate -> every band bucket they share
    // holds 20 members; the near-dup pair's buckets hold 2
    val d = docs(Seq(1L -> base, 2L -> nearDup) ++
      (10L to 29L).map(_ -> boiler): _*)
    val uncapped = Dedup.minhashNearDups(d, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped.contains((1L, 2L)) && uncapped.size == 1 + 20 * 19 / 2)
    val capped = Dedup.minhashNearDups(d, "doc_id", "text",
        numHashes = 64, bands = 16, threshold = 0.5, maxBucketSize = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((1L, 2L))) // quadratic cluster suppressed, recall kept
  }

  test("duplicateClusters: both paths agree over pair chains") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L), (3L, 5L))
      .toDF("id_a", "id_b")
    val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 7L -> 7L, 9L -> 7L)
    val fast = Dedup.duplicateClusters(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast == want)
    // forced past the driver limit -> distributed min-label propagation
    val dist = Dedup.duplicateClusters(pairs, driverEdgeLimit = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == want)
    val distDirect = Dedup.duplicateClustersDistributed(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(distDirect == want)
  }

  test("duplicateClusters: contraction path equals driver truth on a mixed graph") {
    // deterministic mix of chains, stars, and singleton-pair components
    // spread over many partitions: 600 edges, forced through the
    // partition-local contraction (limit 10) vs the driver union-find
    val edges =
      (0L until 200L).map(i => (i * 7 % 1000, i * 7 % 1000 + 1000)) ++   // stars
      (0L until 300L).map(i => (2000 + i, 2000 + i + 1)) ++              // one chain
      (0L until 100L).map(i => (10000 + 2 * i, 10001 + 2 * i))           // pairs
    val df = edges.toDF("id_a", "id_b").repartition(16)
    val truth = Dedup.duplicateClusters(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val contracted = Dedup.duplicateClusters(df, driverEdgeLimit = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(contracted == truth)
    // the chain collapses to one min-labeled component
    assert(truth(2300L) == 2000L)
  }

  test("simhash: identical docs collide, disjoint docs are far") {
    val d = docs(
      1L -> "spark morton curve block index",
      2L -> "spark morton curve block index",
      3L -> "entirely different vocabulary here today")
    val fps = Dedup.simhash64(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    assert(java.lang.Long.bitCount(fps(1L) ^ fps(3L)) > 3)
    val pairs = Dedup.simhashNearDups(d, "doc_id", "text", maxHamming = 3)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngramJaccardNearDups on character shingles") {
    val d = docs(
      1L -> "the quick brown fox jumps over the lazy dog",
      2L -> "the quick brown fox jumps over the lazy cat",
      3L -> "lorem ipsum dolor sit amet consectetur")
    val pairs = Dedup.ngramJaccardNearDups(d, "doc_id", "text", n = 5, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("dupSpanFraction == brute-force gram doc-frequency count") {
    // doc 1/2 share an 8-word run; doc 3 repeats it twice internally
    // (within-doc repeats add multiplicity but not doc-frequency);
    // doc 4 is clean; doc 5 is shorter than the gram (1 degenerate span)
    val shared = "alpha beta gamma delta epsilon zeta eta theta"
    val d = docs(
      1L -> s"one two $shared three four",
      2L -> s"$shared five six seven",
      3L -> s"$shared x $shared",
      4L -> "p q r s t u v w x y z aa bb cc",
      5L -> "tiny doc",
      6L -> "tiny doc")
    def brute(n: Int, minDocs: Int): Map[Long, (Long, Long)] = {
      val rows = d.collect().map(r => (r.getLong(0), r.getString(1)
        .toLowerCase.trim.replaceAll("\\s+", " ")))
      val grams = rows.map { case (id, t) =>
        val ws = t.split(" ")
        val m = math.max(ws.length - n + 1, 1)
        (id, (0 until m).map(i => ws.slice(i, i + n).mkString(" ")))
      }
      val dfreq = grams.flatMap { case (id, gs) => gs.distinct.map((_, id)) }
        .groupBy(_._1).map { case (g, xs) => (g, xs.length) }
      grams.map { case (id, gs) =>
        val dup = gs.count(g => dfreq(g) >= minDocs).toLong
        id -> (gs.length.toLong, dup)
      }.toMap
    }
    for (minDocs <- Seq(2, 3)) {
      val exp = brute(8, minDocs)
      val got = Dedup.dupSpanFraction(d, "doc_id", "text", n = 8, minDocs = minDocs)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
      assert(got.keySet == exp.keySet)
      exp.foreach { case (id, (tot, dup)) =>
        assert(got(id) == ((tot, dup, dup * 1000 / tot)), s"doc $id minDocs $minDocs")
      }
    }
    // sanity on the planted layout at the defaults
    val byId = Dedup.dupSpanFraction(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(byId(4L) == 0L && byId(1L) > 0L && byId(2L) > 0L && byId(5L) == 1L)
  }

  test("pairAgreement counts both/left/right categories of pair sets") {
    val l = Seq((1L, 2L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val r = Seq((3L, 4L), (5L, 6L), (7L, 8L), (9L, 10L)).toDF("id_a", "id_b")
    val got = Dedup.pairAgreement(l, r, "text_only", "emb_only")
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(got == Map("both" -> 2L, "text_only" -> 1L, "emb_only" -> 2L))
  }

  test("dedupApply keeps cluster representatives and all unique docs") {
    val t = "one two three four five six seven eight nine ten"
    val d = docs(
      5L -> t,                     // near-dup cluster {3, 5, 9}: rep = 3
      3L -> t,
      9L -> (t + " eleven"),
      7L -> "totally different content here with many words indeed")
    val kept = Dedup.dedupApply(d, "doc_id", "text")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(3L, 7L))
  }

  test("removeDupSpans cuts cross-doc duplicated grams, keeps unique text") {
    val boiler = "b1 b2 b3 b4 b5 b6 b7 b8" // exactly one 8-gram
    val d = docs(
      1L -> s"u1 u2 u3 $boiler u4 u5",
      2L -> s"v1 $boiler v2 v3",
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9", // fully unique
      4L -> "s1 s2 s3 s4",                // short-doc pair: whole-doc gram
      5L -> "s1 s2 s3 s4")
    val got = Dedup.removeDupSpans(d, "doc_id", "text", n = 8, minDocs = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got(1L) == (("u1 u2 u3 u4 u5", 13L, 8L)))
    assert(got(2L) == (("v1 v2 v3", 11L, 8L)))
    assert(got(3L) == (("w1 w2 w3 w4 w5 w6 w7 w8 w9", 9L, 0L)))
    // a duplicated doc shorter than the gram is removed wholesale
    assert(got(4L) == (("", 4L, 4L)) && got(5L) == (("", 4L, 4L)))
  }

  test("dupSpanFraction plan: one text scan, no join, no text in exchanges") {
    val out = Dedup.dupSpanFraction(docs(1L -> "a b c", 2L -> "a b c"), "doc_id", "text")
    val plan = out.queryExecution.executedPlan
    val s = plan.toString
    assert(!s.contains("Join"), "span totals must come from the gram stream, not a join")
    assert(s.linesIterator.count(_.contains("LocalTableScan")) <= 1 &&
      !s.contains("Union"), "text must be scanned exactly once")
    // every exchange's schema is (id, hash, count)-shaped — no strings
    plan.collect { case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e }
      .foreach { e =>
        assert(e.child.output.forall(_.dataType ==
          org.apache.spark.sql.types.LongType), s"wide exchange: ${e.child.output}")
      }
  }

  test("cdcContainment finds embedded documents; boilerplate chunks capped") {
    val rnd = new scala.util.Random(29)
    def rand(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val core = rand(2000)
    val a = core // the original
    val b = rand(500) + core + rand(500) // A embedded in B
    val c = rand(3000) // unrelated
    val d = docs(1L -> a, 2L -> b, 3L -> c)
    val pairs = Dedup.cdcContainment(d, "doc_id", "text", w = 8, modulus = 32)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(pairs.contains((1L, 2L)), s"embedded pair missing: ${pairs.keys}")
    val (sharedLen, sharedChunks, permille) = pairs((1L, 2L))
    // the shared core realigns after at most one window per edge
    assert(permille >= 900, s"containment of an embedded doc must be high: $permille")
    assert(sharedChunks >= 10 && sharedLen >= 1800)
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "unrelated docs must not pair")

    // a chunk shared by MANY docs is boilerplate: capped out, no pair explosion
    val boiler = rand(400)
    val many = docs((1L to 20L).map(i => i -> (boiler + rand(40))): _*)
    val bp = Dedup.cdcContainment(many, "doc_id", "text",
      w = 8, modulus = 32, maxDf = 10, minSharedChunks = 1)
    assert(bp.count() == 0, "df-capped boilerplate must produce no pairs")
  }

  test("minhashJaccardGauge: identical docs estimate 1000, estimates are " +
      "deterministic and bounded") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    // one token substituted at the tail: 25 of 28 3-gram shingles
    // shared (J ~ 0.81), which the 16x4 banding candidates with
    // near-certainty — deterministically, since nothing uses RNG
    val half = (1 to 29).map(i => s"tok$i").mkString(" ") + " tokX"
    val d = docs(1L -> base, 2L -> base, 3L -> half)
    val got = Dedup.minhashJaccardGauge(d, "doc_id", "text",
      shingleLen = 3, numHashes = 32, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getLong(3)))).toMap
    // identical pair: exact 1.0, every signature row matches -> 1000
    val (j12, e12) = got((1L, 2L))
    assert(j12 == 1.0 && e12 == 1000L, got.toString)
    // the half-overlap pairs: estimate in [0, 1000], equal for the two
    // symmetric pairs (same signatures), reproducible across runs
    val (j13, e13) = got((1L, 3L))
    val (j23, e23) = got((2L, 3L))
    assert(j13 == j23 && e13 == e23, got.toString)
    assert(e13 >= 0L && e13 <= 1000L, got.toString)
    val again = Dedup.minhashJaccardGauge(d, "doc_id", "text",
      shingleLen = 3, numHashes = 32, threshold = 0.2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(3)).toMap
    assert(again((1L, 3L)) == e13, "estimates must be deterministic")
  }

  test("paragraph dedup: shared footers excised, unique content survives verbatim") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val footer = "Subscribe to our newsletter"
    val d = Seq(
      (1L, "Unique alpha content\n" + footer),
      (2L, "Other beta stuff\n\n" + footer.toUpperCase + "  "), // norm-variant
      (3L, "solo gamma text only"),
      (4L, footer)) // a doc that IS the boilerplate
      .toDF("id", "text")
    val got = Dedup.paragraphDedup(d, "id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // original text (case, spacing) preserved for survivors
    assert(got(1L) == (("Unique alpha content", 2L, 1L)))
    assert(got(2L) == (("Other beta stuff", 2L, 1L)))
    assert(got(3L) == (("solo gamma text only", 1L, 0L)))
    assert(got(4L) == (("", 1L, 1L)))
    // minDocs above the plant: nothing removed
    val none = Dedup.paragraphDedup(d, "id", "text", minDocs = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(none.values.forall(_ == 0L))
  }

  test("paragraph dedup: within-doc repetition alone is not boilerplate") {
    import spark.implicits._
    val d = Seq(
      (1L, "same para\nsame para\nother"),
      (2L, "different content here")).toDF("id", "text")
    val got = Dedup.paragraphDedup(d, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    // "same para" repeats only INSIDE doc 1 (1 distinct doc) -> kept
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }
}
