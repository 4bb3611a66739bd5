package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class SuffixArraySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def norm(s: String): Array[String] =
    s.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)

  /** Brute force: maxrep(doc, pos) = longest common prefix of that
    * suffix with ANY other suffix in the corpus. */
  private def bruteSpans(rows: Seq[(Long, String)],
      minLen: Int): Map[Long, (Long, Long)] = {
    val sufs = rows.flatMap { case (id, t) =>
      val w = norm(t)
      w.indices.map(p => (id, p, w.drop(p).toSeq))
    }
    def lcp(a: Seq[String], b: Seq[String]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val maxrep = sufs.map { case (id, p, s) =>
      val m = sufs.collect {
        case (id2, p2, s2) if (id2, p2) != (id, p) => lcp(s, s2)
      }.max
      (id, p, m)
    }
    maxrep.groupBy(_._1).map { case (id, g) =>
      id -> ((g.map(_._3).max.toLong,
        g.count(_._3 >= minLen).toLong))
    }
  }

  private def got(d: DataFrame, minLen: Int): Map[Long, (Long, Long)] =
    SuffixArray.repeatedSpans(d, "doc_id", "text", minLen)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

  test("repeatedSpans == brute force on a planted-span corpus") {
    val shared = "alpha beta gamma delta epsilon zeta"
    val rows = Seq(
      1L -> s"one two $shared three",
      2L -> s"$shared four five six",
      3L -> s"seven eight nine ten eleven",
      4L -> s"rep rep rep rep rep",            // within-doc repeats
      5L -> s"three four five six",            // overlaps doc 2's tail
      6L -> "unique singleton words only here")
    val d = docs(rows: _*)
    for (minLen <- Seq(2, 4)) {
      assert(got(d, minLen) == bruteSpans(rows, minLen), s"minLen=$minLen")
    }
  }

  test("identical documents: every position repeats at full suffix length") {
    val rows = Seq(1L -> "a b c d e", 2L -> "a b c d e", 3L -> "x y z")
    val d = docs(rows: _*)
    assert(got(d, 3) == bruteSpans(rows, 3))
    // doc 1's max repeat = its full length (its twin)
    assert(got(d, 3)(1L) == ((5L, 3L)))
  }

  test("doubling loop converges within log2(max doc words) rounds") {
    val rows = (1L to 6L).map(i =>
      i -> (s"w$i " * 20 + "shared tail words here"))
    val (_, tables, rep) = SuffixArray.doublingRanks(
      docs(rows: _*), "doc_id", "text")
    assert(rep.converged)
    // 24 words max -> width reaches >= 24 by round 5 (2^5 = 32)
    assert(rep.rounds <= 5, rep.toString)
    assert(rep.positions == rows.map(r => norm(r._2).length).sum)
    tables.foreach(_ => ()) // tables freed by repeatedSpans path only
  }

  test("final ranks order suffixes exactly like a brute-force sort") {
    val rows = Seq(1L -> "b a c a b", 2L -> "a c a", 3L -> "c b a c")
    val (ranks, _, _) = SuffixArray.doublingRanks(
      docs(rows: _*), "doc_id", "text")
    val sufs = rows.flatMap { case (id, t) =>
      val w = norm(t)
      w.indices.map(p => ((id, p), w.drop(p).toSeq))
    }.toMap
    val gotRanks = ranks.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    // rank = number of strictly-smaller suffixes (count-prefix rank)
    import scala.math.Ordering.Implicits._
    sufs.foreach { case (key, s) =>
      val smaller = sufs.values.count(_ < s)
      assert(gotRanks(key) == smaller.toLong, s"suffix $key = $s")
    }
  }

  /** Brute removal truth: positions covered by any >= minLen repeated
    * run's interval [p, p + maxrep(p)). */
  private def bruteClean(rows: Seq[(Long, String)],
      minLen: Int): Map[Long, (String, Long, Long)] = {
    val sufs = rows.flatMap { case (id, t) =>
      val w = norm(t)
      w.indices.map(p => (id, p, w.drop(p).toSeq))
    }
    def lcp(a: Seq[String], b: Seq[String]): Int =
      a.zip(b).takeWhile { case (x, y) => x == y }.size
    val maxrep = sufs.map { case (id, p, s) =>
      (id, p) -> sufs.collect {
        case (id2, p2, s2) if (id2, p2) != (id, p) => lcp(s, s2)
      }.foldLeft(0)(math.max)
    }.toMap
    rows.map { case (id, t) =>
      val w = norm(t)
      val removed = w.indices.filter(q => w.indices.exists(p =>
        p <= q && maxrep((id, p)) >= minLen && q < p + maxrep((id, p))))
      val clean = w.indices.filterNot(removed.contains).map(w)
      id -> ((clean.mkString(" "), w.length.toLong, removed.size.toLong))
    }.toMap
  }

  test("removeRepeatedSpans == brute interval-union removal") {
    val shared = "alpha beta gamma delta"
    val rows = Seq(
      1L -> s"one two $shared three four",
      2L -> s"$shared five six seven eight",
      3L -> s"rep rep rep rep rep rep",       // within-doc overlap runs
      4L -> "solo unique words only here",
      5L -> s"nine $shared ten")
    for (minLen <- Seq(2, 3, 4)) {
      val got = SuffixArray.removeRepeatedSpans(docs(rows: _*),
          "doc_id", "text", minLen)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == bruteClean(rows, minLen), s"minLen=$minLen")
    }
  }

  test("persisted span index serves removal identically to the fresh build") {
    val rows = Seq(
      1L -> "one two alpha beta gamma three",
      2L -> "alpha beta gamma four five six",
      3L -> "rep rep rep rep rep")
    val dir = java.nio.file.Files.createTempDirectory("sa_idx").toString
    SuffixArray.writeSpanIndex(docs(rows: _*), "doc_id", "text", dir)
    // the index is minLen-AGNOSTIC: one build serves both thresholds
    for (minLen <- Seq(2, 3)) {
      val fresh = SuffixArray.removeRepeatedSpans(docs(rows: _*),
          "doc_id", "text", minLen)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      val served = SuffixArray.removeRepeatedSpansIndexed(spark, dir,
          docs(rows: _*), "doc_id", "text", minLen)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(served == fresh, s"minLen=$minLen")
    }
  }

  test("removeRepeatedSpans: untouched corpus passes through verbatim") {
    val rows = Seq(1L -> "all distinct words here",
      2L -> "nothing shared anywhere today")
    val got = SuffixArray.removeRepeatedSpans(docs(rows: _*),
        "doc_id", "text", 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(3)))).toMap
    assert(got == Map(1L -> (("all distinct words here", 0L)),
      2L -> (("nothing shared anywhere today", 0L))))
  }

  test("gated driver SA+LCP equals the distributed loop value-for-value " +
      "(r21), including null-text and empty-text docs") {
    // planted cross-doc span + within-doc repeats + identical twins +
    // a null text (splits to null = zero positions, dropped by both
    // paths) + an empty text (one "" token position)
    val shared = "alpha beta gamma delta epsilon"
    val rows = Seq(
      (1L, Option(s"one two $shared three")),
      (2L, Option(s"$shared four five")),
      (3L, Option("rep rep rep rep")),
      (4L, Option("rep rep rep rep")),
      (5L, None: Option[String]),
      (6L, Option("")),
      (7L, Option("three four five")))
    val d = rows.toDF("doc_id", "text")
    def spans(limit: Long) =
      SuffixArray.repeatedSpans(d, "doc_id", "text", 2, limit)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
        .toMap
    val fast = spans(SuffixArray.defaultDriverPosLimit)
    val loop = spans(0L)
    assert(fast == loop, s"driver $fast != distributed $loop")
    assert(!fast.contains(5L) && fast.contains(6L), fast.toString)
    def removed(limit: Long) =
      SuffixArray.removeRepeatedSpans(d, "doc_id", "text", 2, limit)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(3)))).toMap
    val rFast = removed(SuffixArray.defaultDriverPosLimit)
    val rLoop = removed(0L)
    assert(rFast == rLoop, s"driver $rFast != distributed $rLoop")
    // the planted span was actually excised on both paths
    assert(rFast(1L)._2 == 5L, rFast.toString)
  }

  test("degenerate inputs: single doc, single word, empty corpus") {
    val one = docs(1L -> "only")
    // a lone suffix has no other suffix: zero repeat, reported as 0
    // (the oracle's NULL lag/lead branches)
    assert(got(one, 1) == Map(1L -> ((0L, 0L))))
    val rows = Seq(1L -> "a", 2L -> "a", 3L -> "b")
    assert(got(docs(rows: _*), 1) == bruteSpans(rows, 1))
    // empty corpus: empty result, no null-aggregate NPE
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SuffixArray.repeatedSpans(empty, "doc_id", "text", 1)
      .collect().isEmpty)
  }
}
