package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class CorpusMixSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*): DataFrame =
    rows.toDF("doc_id", "source", "lang", "text")

  test("corpusProfile: per-source card, dups attributed to BOTH sources") {
    val d = docs(
      (1L, "a", "en", "one two three"),   // dup with doc 4 (source b)
      (2L, "a", "fr", "quatre cinq"),
      (3L, "a", "en", "unique words here and more"),
      (4L, "b", "en", "one  TWO three "), // normalizes equal to doc 1
      (5L, "b", "de", "ganz anders"))
    val got = CorpusMix.corpusProfile(d, "text", "lang", "source")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    // a: 3 docs, 2 langs, 3+2+5=10 words, mean 3 (10 div 3), 1 dup,
    //    333333 ppm; b: 2 docs, 2 langs, 5 words, mean 2, 1 dup, 500000
    assert(got == Map(
      "a" -> ((3L, 2L, 10L, 3L, 1L, 333333L)),
      "b" -> ((2L, 2L, 5L, 2L, 1L, 500000L))), got.toString)
  }

  test("sourceMix counts docs/tokens per cell and shares sum to ~1e6") {
    val d = docs(
      (1L, "a", "en", "one two three"),    // 3 tokens
      (2L, "a", "en", "four five"),        // 2
      (3L, "a", "fr", "un deux trois"),    // 3
      (4L, "b", "en", "x y"))              // 2
    val got = CorpusMix.sourceMix(d, "source", "lang", "text")
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got(("a", "en")) == ((2L, 5L, 500000L)))
    assert(got(("a", "fr")) == ((1L, 3L, 300000L)))
    assert(got(("b", "en")) == ((1L, 2L, 200000L)))
    // floor keeps the total at or just under 1e6
    val totalPpm = got.values.map(_._3).sum
    assert(totalPpm <= 1000000L && totalPpm > 1000000L - got.size)
  }

  test("resampleBySource keeps exactly the ids whose bucket < source pct") {
    val rows = (1L to 400L).map { id =>
      (id, if (id % 2 == 0) "keep_half" else "keep_all", "en", s"doc $id")
    }
    val d = docs(rows: _*)
    val got = CorpusMix.resampleBySource(d, "doc_id", "source",
        Map("keep_half" -> 50), defaultPct = 100)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bucket = (id: Long) =>
      java.lang.Math.floorMod(java.lang.Math.floorMod(id, 1000003L) * 2654435761L, 100L)
    val expect = rows.collect {
      case (id, src, _, _) if src == "keep_all" || bucket(id) < 50 => id
    }.toSet
    assert(got == expect)
    // determinism: a rerun keeps the identical set
    val again = CorpusMix.resampleBySource(d, "doc_id", "source",
        Map("keep_half" -> 50)).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == got)
    // and the half-kept source really was thinned
    val halfKept = got.count(_ % 2 == 0)
    assert(halfKept < 200 && halfKept > 50)
  }

  test("stratifiedSampleExact == naive hash-rank top-k on skewed strata") {
    // giant stratum, mid stratum, and one SMALLER than k
    val rows = (0 until 900).map(i => (i.toLong, "big", "en", "t")) ++
      (900 until 960).map(i => (i.toLong, "mid", "en", "t")) ++
      (960 until 963).map(i => (i.toLong, "tiny", "en", "t"))
    val d = docs(rows: _*)
    def lehmer3(x: Long): Long = {
      var a = ((x % 2147483646L + 2147483646L) % 2147483646L) + 1L
      (1 to 3).foreach(_ => a = a * 48271L % 2147483647L)
      a
    }
    def naive(k: Int): Map[String, Seq[Long]] =
      rows.groupBy(_._2).map { case (s, rs) =>
        s -> rs.map(_._1).sortBy(id => (lehmer3(id), id)).take(k)
      }
    for (k <- Seq(1, 7, 80)) {
      val got = CorpusMix.stratifiedSampleExact(d, "doc_id", "source", k)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2)))
        .groupBy(_._1).map { case (s, xs) => s -> xs.sortBy(_._3).map(_._2).toSeq }
      assert(got == naive(k), s"k=$k")
      assert(got("tiny").size == math.min(k, 3), s"k=$k small stratum exact")
    }
    // result is partitioning-invariant
    val rep = CorpusMix.stratifiedSampleExact(d.repartition(13), "doc_id", "source", 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val one = CorpusMix.stratifiedSampleExact(d.coalesce(1), "doc_id", "source", 7)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(rep == one)
  }

  test("sourceOverlap == hand-computed trigram Jaccard per source pair") {
    val d = docs(
      (1L, "a", "en", "w x y z"),       // trigrams: {w x y, x y z}
      (2L, "b", "en", "w x y q"),       // {w x y, x y q}
      (3L, "b", "en", "x y z r"),       // {x y z, y z r}
      (4L, "c", "en", "p q r s"))       // {p q r, q r s} — disjoint
    val got = CorpusMix.sourceOverlap(d, "source", "text", n = 3)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // a={wxy,xyz} (2), b={wxy,xyq,xyz,yzr} (4): shared 2, union 4
    assert(got(("a", "b")) == ((2L, 4L, 2L, 500000L)))
    // zero-overlap pairs are absent, matching the inner-count form
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")))
  }

  test("globalShuffle is the exact hash permutation, bucket-invariant, balanced") {
    import graft.functions.HashKernels
    def hash62(x: Long): Long =
      HashKernels.lehmer3(x) * 2147483648L + HashKernels.lehmer3(x + 700001L)
    val ids = (0L until 1000L) ++ Seq(5000000000L, -17L) // wide + negative ids
    val d = ids.map(i => (i, "s", "en", "t")).toDF("doc_id", "source", "lang", "text")
    val expPos = ids.sortBy(i => (hash62(i), i)).zipWithIndex
      .map { case (id, p) => id -> p.toLong }.toMap
    val got = CorpusMix.globalShuffle(d, "doc_id", nShards = 7).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.size == ids.size)
    ids.foreach { id =>
      val (pos, shard) = got(id)
      assert(pos == expPos(id), s"id $id")
      assert(shard == pos % 7)
    }
    // shard sizes balanced within 1 doc
    val sizes = got.values.groupBy(_._2).values.map(_.size)
    assert(sizes.max - sizes.min <= 1)
    // the bucket count is an internal parallelism dial, not a semantic
    val coarse = CorpusMix.globalShuffle(d, "doc_id", nShards = 7, log2Buckets = 3)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(coarse == got)
  }

  test("globalShuffle boundedness: the unpartitioned window sees only the bucket frame") {
    // The offsets window (Window.orderBy(__b), no partitionBy) is the
    // op's one single-partition stage; it must run over the REDUCED
    // groupBy(__b) frame (<= 2^log2Buckets rows at ANY corpus size),
    // never the corpus. Guard both structurally and numerically so a
    // refactor can't silently unbound it.
    val d = (0L until 5000L).map(i => (i, "s", "en", "t"))
      .toDF("doc_id", "source", "lang", "text")
    val out = CorpusMix.globalShuffle(d, "doc_id", nShards = 4, log2Buckets = 3)
    out.count() // finalize the adaptive plan before inspecting it
    val helper = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
    val windows = helper.collectWithSubqueries(out.queryExecution.executedPlan) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    val unpartitioned = windows.filter(_.partitionSpec.isEmpty)
    assert(unpartitioned.nonEmpty, "expected the bucket-offset window")
    unpartitioned.foreach { w =>
      val aggsBelow = w.child.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }
      assert(aggsBelow.nonEmpty,
        s"unpartitioned window must consume the aggregated bucket frame:\n$w")
    }
    // numeric bound: distinct buckets <= 2^log2Buckets even at corpus
    // sizes many times the bucket count
    import graft.functions.HashKernels
    def hash62(x: Long): Long =
      HashKernels.lehmer3(x) * 2147483648L + HashKernels.lehmer3(x + 700001L)
    val nBuckets = (0L until 5000L).map(i => hash62(i) >> 59).distinct.size
    assert(nBuckets <= 8, s"bucket frame must stay <= 2^3 rows, got $nBuckets")
  }

  test("temperatureResample: tempered keep fractions, smallest source keeps all") {
    // src big: 300 docs x 10 tokens; src small: 30 x 10 -> at alpha 0.5
    // big keeps sqrt(300/3000) wait: f = sqrt(tmin/ts): big
    // f = sqrt(300/3000) ~ 0.316, small f = 1.0
    val d = ((0 until 300).map(i => (i.toLong, "big", "en", Seq.fill(10)("w").mkString(" "))) ++
      (1000 until 1030).map(i => (i.toLong, "small", "en", Seq.fill(10)("w").mkString(" "))))
      .toDF("doc_id", "source", "lang", "text")
    val got = CorpusMix.temperatureResample(d, "doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    val bySrc = got.groupBy(_._2)
    // the smallest source's threshold is exactly 1e6 -> every doc kept
    assert(bySrc("small").length == 30)
    assert(bySrc("small").head._3 == 1000000L)
    val bigPpm = bySrc("big").head._3
    assert(bigPpm == math.floor(math.sqrt(300.0 / 3000.0) * 1e6).toLong)
    // the id-hash keep rule is exact: recompute it
    val expectBig = (0 until 300).count { i =>
      (i.toLong % 1000003L) * 2654435761L % 1000000L < bigPpm
    }
    assert(bySrc("big").length == expectBig)
  }

  test("byteShards == naive running-sum sharding; window stays bucket-bounded") {
    val rng = new scala.util.Random(31)
    val docs = (0 until 800).map(i => (i.toLong * 7 + 3, "x" * (20 + rng.nextInt(200))))
    val d = docs.toDF("doc_id", "text")
    val out = CorpusMix.byteShards(d, "doc_id", "text",
        bytesPerShard = 5000L, nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    var cum = 0L
    val expect = docs.sortBy(_._1).map { case (id, t) =>
      val row = (id, t.length.toLong, cum / 5000L); cum += t.length; row
    }
    assert(out.toSeq == expect)
    // shard sizes respect the budget up to one straddling doc
    val maxDoc = docs.map(_._2.length).max
    out.groupBy(_._3).values.foreach { s =>
      assert(s.map(_._2).sum <= 5000L + maxDoc)
    }
  }

  test("prioritySample: portable-hash priorities match a replica; top-k is a " +
      "total order; empty docs floor to weight 1") {
    import graft.functions.HashKernels
    val docs = ((1L to 50L).map(i => (i, ("w " * i.toInt).trim)) :+ (51L, ""))
      .toDF("doc_id", "text")
    val got = CorpusMix.prioritySample(docs, "doc_id", "text", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def h62(x: Long): Long =
      HashKernels.lehmer3(x) * 2147483648L + HashKernels.lehmer3(x + 700001L)
    def key(id: Long, w: Long): Long = (w * 1048576L) / ((h62(id) >> 42) + 1L)
    val expect = ((1L to 50L).map(i => (i, i, key(i, i))) :+
        (51L, 1L, key(51L, 1L)))
      .sortBy(r => (-r._3, r._1)).take(10)
    assert(got.toSeq == expect, s"got ${got.toSeq} expect $expect")
  }

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val b = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val got = CorpusMix.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"), got.toString)
    // normalization-invariant: case/whitespace variants are unchanged
    val b2 = Seq((1L, "  ALPHA  ")).toDF("doc_id", "text")
    val a2 = Seq((1L, "alpha")).toDF("doc_id", "text")
    val got2 = CorpusMix.snapshotDiff(a2, b2, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 == Map(1L -> "unchanged"), got2.toString)
  }

  test("prioritySampleByStratum ranks the same keys within each stratum") {
    import graft.functions.HashKernels
    val docs = (1L to 40L).map(i =>
      (i, if (i % 2 == 0) "even" else "odd", ("w " * (i % 9 + 1).toInt).trim))
      .toDF("doc_id", "source", "text")
    val got = CorpusMix.prioritySampleByStratum(docs, "doc_id", "source",
        "text", k = 3)
      .collect()
      .map(r => (r.getString(1), r.getLong(0), r.getLong(3), r.getLong(4)))
    def h62(x: Long): Long =
      HashKernels.lehmer3(x) * 2147483648L + HashKernels.lehmer3(x + 700001L)
    def key(id: Long): Long = ((id % 9 + 1) * 1048576L) / ((h62(id) >> 42) + 1L)
    val expect = (1L to 40L).map(i => (if (i % 2 == 0) "even" else "odd", i, key(i)))
      .groupBy(_._1).toSeq.flatMap { case (src, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
          .map { case ((s2, id, k2), rk) => (s2, id, k2, rk + 1L) }
      }.sortBy(r => (r._1, r._4))
    assert(got.sortBy(r => (r._1, r._4)).toSeq == expect,
      s"got ${got.toSeq} expect $expect")
  }

  test("snapshotDiff: NULL-text documents classify by presence, not by " +
      "fingerprint nullity") {
    val a = Seq((1L, null.asInstanceOf[String]), (2L, null.asInstanceOf[String]),
      (3L, "real")).toDF("doc_id", "text")
    val b = Seq((2L, null.asInstanceOf[String]), (3L, null.asInstanceOf[String]),
      (4L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = CorpusMix.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 1: null-text present only in prev -> removed (NOT 'added');
    // 2: null in both -> unchanged; 3: real -> null -> changed;
    // 4: null-text only in cur -> added
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"), got.toString)
  }

  test("registrableDomain handles schemes, userinfo, ports, PSL suffixes") {
    val cases = Seq(
      "https://www.example.com/path?q=1" -> "example.com",
      "http://user:pw@sub.a.example.co.uk:8080/x#f" -> "example.co.uk",
      "ftp://deep.sub.thing.com.au/" -> "thing.com.au",
      "Example.ORG" -> "example.org", // no scheme, case-folded
      "example.com." -> "example.com", // trailing root dot
      "localhost" -> "localhost", // single label
      "http://192.168.0.1:9090/admin" -> "192.168.0.1", // IPv4 passthrough
      "http://[2001:db8::1]:443/x" -> "2001:db8::1", // bracketed IPv6
      "http://[2001:DB8::1]/x" -> "2001:db8::1", // IPv6 case-folds too
      "https://a@b@x.com/p" -> "x.com", // host after the LAST @ (WHATWG)
      "https://a.b.c.d.e.org/x" -> "e.org", // default rule: last label
      "" -> "")
    val got = cases.map(_._1).toDF("url")
      .select(CorpusMix.registrableDomain(org.apache.spark.sql.functions.col("url"))).collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), have) =>
      assert(have == want, s"$in -> $have, wanted $want") }
  }

  test("domainMix groups token accounting by extracted domain") {
    val d = Seq(
      (1L, "https://www.x.com/a", "en", "one two"),
      (2L, "http://x.com/b", "en", "three"),
      (3L, "https://y.co.uk/c", "en", "four five six"))
      .toDF("doc_id", "url", "lang", "text")
    val got = CorpusMix.domainMix(d, "url", "lang", "text")
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // x.com: 2 docs, 3 tokens, 500000 ppm; y.co.uk: 1 doc, 3 tokens
    assert(got == Map("x.com" -> ((2L, 3L, 500000L)),
      "y.co.uk" -> ((1L, 3L, 500000L))), got.toString)
  }

  test("canonicalUrl normalizes every rule; non-defaults survive") {
    val cases = Seq(
      // param sort + utm/click-id strip
      "https://x.com/p?b=2&utm_source=a&a=1&gclid=z" -> "https://x.com/p?a=1&b=2",
      // case, default port, fragment
      "HTTPS://X.CoM:443/p#frag" -> "https://x.com/p",
      "http://x.com:80/p" -> "http://x.com/p",
      // NON-default port survives; other scheme's default survives
      "https://x.com:8443/p" -> "https://x.com:8443/p",
      "http://x.com:443/p" -> "http://x.com:443/p",
      // userinfo to the LAST @ (WHATWG)
      "https://a@b@x.com/p" -> "https://x.com/p",
      // trailing slash off non-root; root kept; empty path -> root
      "https://x.com/a/b/" -> "https://x.com/a/b",
      "https://x.com/" -> "https://x.com/",
      "https://x.com" -> "https://x.com/",
      // utm-only query drops the '?' entirely
      "https://x.com/p?utm_campaign=c&utm_medium=m" -> "https://x.com/p",
      // repeated param values both kept, sorted stably
      "https://x.com/p?a=2&a=1" -> "https://x.com/p?a=1&a=2",
      // valueless and empty params: bare name kept, empty dropped
      "https://x.com/p?flag&&a=1" -> "https://x.com/p?a=1&flag",
      // 'ref' is CONTENT-BEARING (GitHub ?ref=<branch>): kept by
      // default — stripping it is opt-in via extraParams
      "https://x.com/p?ref=main&referrer=keep" -> "https://x.com/p?ref=main&referrer=keep",
      // bracketed IPv6 + port
      "https://[2001:DB8::1]:443/p" -> "https://[2001:db8::1]/p",
      "https://[2001:db8::1]:8080/p" -> "https://[2001:db8::1]:8080/p")
    val got = cases.map(_._1).toDF("url")
      .select(CorpusMix.canonicalUrl(org.apache.spark.sql.functions.col("url")))
      .collect().map(_.getString(0))
    cases.zip(got).foreach { case ((in, want), have) =>
      assert(have == want, s"$in -> $have, wanted $want") }
  }

  test("canonicalUrl extraParams opts generic names into stripping") {
    import org.apache.spark.sql.functions.col
    val got = Seq("https://x.com/p?ref=spam&a=1").toDF("url")
      .select(CorpusMix.canonicalUrl(col("url"), extraParams = Seq("ref")))
      .collect().map(_.getString(0))
    assert(got.head == "https://x.com/p?a=1", got.head)
  }

  test("urlDedup groups canonical variants under the smallest id") {
    val d = Seq(
      (5L, "https://x.com/p?b=2&a=1"),
      (3L, "https://X.com/p?a=1&b=2&utm_source=s"),
      (9L, "https://x.com/p/?a=1&b=2#f"),
      (7L, "https://y.com/q"))
      .toDF("doc_id", "url")
    val got = CorpusMix.urlDedup(d, "doc_id", "url")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set(("https://x.com/p?a=1&b=2", 3L, 3L),
      ("https://y.com/q", 7L, 1L)), got.toString)
  }

  // a Gopher-passing 40-word text: 10 distinct stopwords + 30 plain
  // alpha words, no symbols — every rule green
  private val stopRun = "the a of and to in is that it for"
  private val goodText = stopRun + " " +
    Seq.fill(3)("alpha beta gamma delta epsilon zeta eta theta iota kappa")
      .mkString(" ")
  private val otherText = stopRun + " " +
    Seq.fill(3)("rho sigma tau upsilon phi chi psi omega mu nu")
      .mkString(" ")

  private def crawl(rows: (Long, String, Int, String)*): DataFrame =
    rows.toDF("doc_id", "url", "status", "text")

  test("curateStages drops at each stage for exactly its own reason") {
    val d = crawl(
      (1L, "https://a.com/p?b=2&a=1", 200, goodText + " one"),
      // same canonical URL as 1 -> url-dedup drop
      (2L, "https://a.com/p?a=1&b=2&utm_source=x", 200, goodText + " two"),
      (3L, "https://b.com/p", 404, goodText + " three"), // status drop
      (4L, "https://c.com/p", 200, "too short"),         // gate drop
      // exact text dup of 1 on a different site -> exact drop
      (5L, "https://d.com/p", 200, goodText + " one"),
      // near dup of 1 (word-shingle J ~ 0.9) -> near drop
      (6L, "https://e.com/p", 200, goodText + " one extra suffix words here"),
      (7L, "https://f.com/p", 200, otherText))           // survives
    val stages = CorpusMix.curateStages(d, "doc_id", "url", "status", "text")
    val counts = stages.map { case (n, sdf) => n -> sdf.count() }.toMap
    assert(counts == Map("parsed" -> 7L, "response_200" -> 6L,
      "url_unique" -> 5L, "quality_kept" -> 4L, "exact_unique" -> 3L,
      "near_unique" -> 2L), counts.toString)
    val survivors = stages.last._2.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(survivors == Set(1L, 7L), survivors.toString)
    CorpusMix.freeStages(stages)
  }

  test("curateFunnelCounts matches the staged funnel count-for-count") {
    val d = crawl(
      (1L, "https://a.com/p?b=2&a=1", 200, goodText + " one"),
      (2L, "https://a.com/p?a=1&b=2&utm_source=x", 200, goodText + " two"),
      (3L, "https://b.com/p", 404, goodText + " three"),
      (4L, "https://c.com/p", 200, "too short"),
      (5L, "https://d.com/p", 200, goodText + " one"),
      (6L, "https://e.com/p", 200, goodText + " one extra suffix words here"),
      (7L, "https://f.com/p", 200, otherText))
    val stages = CorpusMix.curateStages(d, "doc_id", "url", "status", "text")
    val staged = stages.map { case (n, sdf) => n -> sdf.count() }.toMap
    CorpusMix.freeStages(stages)
    val onePass = CorpusMix.curateFunnelCounts(d, "doc_id", "url",
        "status", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(onePass == staged, s"one-pass $onePass vs staged $staged")
    // and on a crawl with NO rows at all the six stages report 0
    val empty = CorpusMix.curateFunnelCounts(crawl(), "doc_id", "url",
        "status", "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(empty.keySet.size == 6 && empty.values.forall(_ == 0L),
      empty.toString)
  }

  test("curatePipeline caps each domain's token budget in id order") {
    val d = crawl(
      (1L, "https://a.com/p", 200, goodText + " one"),
      (7L, "https://f.com/p", 200, otherText),
      // two quality docs on ONE domain, vocabularies disjoint from
      // every other doc (so near-dedup leaves them alone) — the cap
      // must keep only the earlier-crawled one
      (8L, "https://g.com/p1", 200,
        stopRun + " " + Seq.tabulate(30)(i => f"na$i%02d").mkString(" ")),
      (9L, "https://g.com/p2", 200,
        stopRun + " " + Seq.tabulate(30)(i => f"mb$i%02d").mkString(" ")))
    val all = CorpusMix.curatePipeline(d, "doc_id", "url", "status",
        "text", capTokens = Long.MaxValue)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(all.keySet == Set(1L, 7L, 8L, 9L), all.toString)
    assert(all(8L)._1 == "g.com" && all(9L)._1 == "g.com", all.toString)
    // budget = doc 8's own count: 8 fits, 9 overflows, other domains
    // (single docs under budget? 1 and 7 are the same size class) stay
    val capped = CorpusMix.curatePipeline(d, "doc_id", "url", "status",
        "text", capTokens = all(8L)._2)
      .collect().map(_.getLong(0)).toSet
    assert(capped.contains(8L) && !capped.contains(9L), capped.toString)
  }
}
