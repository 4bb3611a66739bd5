package graft

import org.apache.spark.sql.SparkSession
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Bbox, Morton, MortonRange}
import graft.operators.{ImportSpec, PointCloud}

/** Property-based tests (SURVEY §5.2): the SFC path must reproduce the
  * naive answer on arbitrary inputs, and pack→explode must be the
  * identity on the point multiset. ScalaCheck generators are applied
  * with fixed seeds (deterministic trials; the scalatest-scalacheck
  * bridge isn't in the offline cache). */
class PropertySpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def sample[A](g: Gen[A], trial: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(trial))

  private val coord = Gen.choose(0L, 255L)
  private val point = for (x <- coord; y <- coord; z <- Gen.choose(0, 99))
    yield (x.toDouble, y.toDouble, z.toDouble)
  private val points = Gen.nonEmptyListOf(point)
  private val bboxGen = for {
    x1 <- coord; x2 <- coord; y1 <- coord; y2 <- coord
  } yield Bbox(math.min(x1, x2), math.max(x1, x2), math.min(y1, y2), math.max(y1, y2))

  test("morton roundtrip on random coordinates (pure kernel)") {
    for (t <- 1L to 500L) {
      val (x, y) = (sample(coord, t), sample(coord, t + 10000))
      val m = Morton.encode(x, y)
      assert(Morton.decodeX(m) == x && Morton.decodeY(m) == y, s"($x, $y)")
    }
  }

  test("mortonRanges cover every bbox cell (pure kernel)") {
    for (t <- 1L to 200L) {
      val b = sample(bboxGen, t)
      val tailLen = 2 * sample(Gen.choose(0, 4), t + 777)
      val hr = MortonRange.decompose(b, 16, tailLen, maxCells = 1024)
      for (s <- 1L to 20L) {
        val px = sample(Gen.choose(b.xMin.toLong, b.xMax.toLong), t * 100 + s)
        val py = sample(Gen.choose(b.yMin.toLong, b.yMax.toLong), t * 100 + s + 50)
        val head = Morton.encode(px, py) >> tailLen
        val hit = (hr.contained ++ hr.partial).exists {
          case (lo, hi) => head >= lo && head <= hi
        }
        assert(hit, s"bbox $b tail $tailLen point ($px, $py)")
      }
    }
  }

  test("pack -> explode identity and SFC bbox query ≡ naive filter") {
    for (t <- 1L to 8L) {
      val pts = sample(points, t)
      val b = sample(bboxGen, t + 31337)
      val cloud = PointCloud.importPoints(pts.toDF("x", "y", "z"),
        ImportSpec(name = "prop", ratio = 0.6))
      val all = cloud.bboxQuery(Bbox(0, 255, 0, 255))
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).sorted
      assert(all.toSeq == pts.sorted)
      val got = cloud.bboxQuery(b)
        .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).sorted
      val want = pts.filter(p => p._1 >= b.xMin && p._1 <= b.xMax &&
        p._2 >= b.yMin && p._2 <= b.yMax).sorted
      assert(got.toSeq == want, s"trial $t bbox $b")
    }
  }

  test("globalShuffle is a permutation matching the hash order on random id sets") {
    import graft.functions.HashKernels
    def h62(x: Long): Long =
      HashKernels.lehmer3(x) * 2147483648L + HashKernels.lehmer3(x + 700001L)
    val idGen = Gen.nonEmptyListOf(Gen.choose(-1000000L, 8000000000L)).map(_.distinct)
    for (t <- 1L to 5L) {
      val ids = sample(idGen, t)
      val shards = 1 + (t % 4).toInt
      val got = graft.operators.CorpusMix
        .globalShuffle(ids.map((_, "d")).toDF("doc_id", "dummy"), "doc_id", shards)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      val exp = ids.sortBy(i => (h62(i), i)).zipWithIndex
      assert(got.size == ids.size, s"trial $t")
      exp.foreach { case (id, p) =>
        assert(got(id) == ((p.toLong, p.toLong % shards)), s"trial $t id $id")
      }
    }
  }

  test("removeDupSpans ≡ brute-force coverage on random small corpora") {
    val word = Gen.oneOf("a", "b", "c", "d")
    val doc = Gen.choose(1, 14).flatMap(n => Gen.listOfN(n, word)).map(_.mkString(" "))
    val corpus = Gen.choose(2, 8).flatMap(n => Gen.listOfN(n, doc))
    val n = 4
    for (t <- 1L to 6L) {
      val texts = sample(corpus, t * 7919)
      def grams(ws: Array[String]): Seq[(Int, String)] = {
        val m = math.max(ws.length - n + 1, 1)
        (0 until m).map(p => p -> ws.slice(p, p + n).mkString(" "))
      }
      val byDoc = texts.zipWithIndex.map { case (tx, i) =>
        (i.toLong, tx.split(" "))
      }
      val dupGrams = byDoc.flatMap { case (id, ws) => grams(ws).map(_._2).distinct.map((_, id)) }
        .groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2).keySet
      val want = byDoc.map { case (id, ws) =>
        val dp = grams(ws).collect { case (p, g) if dupGrams(g) => p }
        val kept = ws.indices.filterNot(i => dp.exists(p => p <= i && i <= p + n - 1))
        id -> ((kept.map(ws).mkString(" "), ws.length.toLong, (ws.length - kept.size).toLong))
      }.toMap
      val got = graft.operators.Dedup
        .removeDupSpans(byDoc.map { case (id, ws) => (id, ws.mkString(" ")) }
          .toDF("doc_id", "text"), "doc_id", "text", n = n, minDocs = 2)
        .collect().map(r => r.getLong(0) ->
          ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == want, s"trial $t corpus $texts")
    }
  }

  test("bm25TopK ranking ≡ brute-force BigInt replica on random corpora") {
    import graft.operators.TextStats
    val word = Gen.oneOf("spark", "hash", "join", "pad", "the", "row")
    val doc = Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, word))
    for (trial <- 1L to 10L) {
      val corpus = (1L to 12L).map(i =>
        i -> sample(doc, trial * 100 + i)).toSeq
      val terms = Seq("spark", "hash")
      val got = TextStats.bm25TopK(
          corpus.map { case (id, ws) => (id, ws.mkString(" ")) }
            .toDF("doc_id", "text"), "doc_id", "text", terms, k = 12)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
      val n = corpus.size
      val a = corpus.map(_._2.size).sum
      def dfOf(t: String) = corpus.count(_._2.contains(t))
      def score(ws: Seq[String]): BigInt = terms.map { t =>
        val tf = ws.count(_ == t)
        if (tf == 0) BigInt(0)
        else {
          val df = dfOf(t)
          val idf = BigInt(1000000) * (2 * (n - df) + 1) / (2 * df + 1)
          idf * 22 * a * tf / (BigInt(10) * a * tf + 3 * a + 9 * ws.size * n)
        }
      }.sum
      val expect = corpus.map { case (id, ws) => (id, score(ws).toLong) }
        .filter { case (id, _) =>
          terms.exists(t => corpus.find(_._1 == id).get._2.contains(t)) }
        .sortBy { case (id, sc) => (-sc, id) }
      assert(got == expect, s"trial $trial: $got vs $expect")
    }
  }

  test("prioritySample is invariant to row order and partitioning") {
    import graft.operators.CorpusMix
    val docs = (1L to 120L).map(i => (i, ("w " * (i % 17 + 1).toInt).trim))
    val base = CorpusMix.prioritySample(
        docs.toDF("doc_id", "text"), "doc_id", "text", k = 15)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val shuffled = CorpusMix.prioritySample(
        scala.util.Random.javaRandomToRandom(new java.util.Random(7))
          .shuffle(docs).toDF("doc_id", "text").repartition(7),
        "doc_id", "text", k = 15)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(base == shuffled)
  }

  test("snapshotDiff partitions ids and is direction-symmetric") {
    import graft.operators.CorpusMix
    val a = (1L to 40L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val b = (21L to 60L).map(i =>
      (i, if (i % 5 == 0) s"doc $i EDITED" else s"doc $i")).toDF("doc_id", "text")
    val fwd = CorpusMix.snapshotDiff(a, b, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // every id in exactly one class, and the classes are the set algebra
    assert(fwd.keySet == (1L to 60L).toSet)
    assert(fwd.count(_._2 == "removed") == 20)
    assert(fwd.count(_._2 == "added") == 20)
    assert(fwd.count(_._2 == "changed") == (21L to 40L).count(_ % 5 == 0))
    // reversing the snapshots swaps added <-> removed, keeps the rest
    val rev = CorpusMix.snapshotDiff(b, a, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rev == fwd.map { case (k, v) => k -> (v match {
      case "added" => "removed"; case "removed" => "added"; case x => x }) })
  }

  test("editSelfJoin == brute force on random low-alphabet strings") {
    import graft.operators.EditJoin
    import org.apache.spark.sql.functions.{col, levenshtein}
    // alphabet of 3 chars and lengths 0..8: dense edit neighborhoods,
    // every segment-boundary and length-delta path exercised
    val strGen = for {
      n <- Gen.choose(0, 8)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    for (trial <- 1L to 8L) {
      val strs = (0 until 60).map(i =>
        (i.toLong, sample(strGen, trial * 1000 + i)))
      val d = strs.toDF("id", "s")
      for (tau <- 1 to 2) {
        val got = EditJoin.editSelfJoin(d, "id", "s", tau, 0)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        val a = d.select(col("id").as("ia"), col("s").as("sa"))
        val b = d.select(col("id").as("ib"), col("s").as("sb"))
        val want = a.crossJoin(b).filter(col("ia") < col("ib"))
          .select(col("ia"), col("ib"), levenshtein(col("sa"), col("sb")).as("d"))
          .filter(col("d") <= tau)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
        assert(got == want, s"trial=$trial tau=$tau")
      }
    }
  }

  test("suffix-array repeated spans == brute force on random word docs") {
    import graft.operators.SuffixArray
    val wordGen = Gen.oneOf("a", "b", "c", "d")
    val docGen = for {
      n <- Gen.choose(1, 12)
      ws <- Gen.listOfN(n, wordGen)
    } yield ws.mkString(" ")
    for (trial <- 1L to 4L) {
      val rows = (1L to 8L).map(i => (i, sample(docGen, trial * 100 + i)))
      val d = rows.toDF("doc_id", "text")
      val got = SuffixArray.repeatedSpans(d, "doc_id", "text", 2)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      // brute: every suffix vs every other suffix
      val sufs = rows.flatMap { case (id, t) =>
        val w = t.split(" ").toSeq
        w.indices.map(p => (id, p, w.drop(p)))
      }
      val maxrep = sufs.map { case (id, p, s) =>
        (id, sufs.collect { case (i2, p2, s2) if (i2, p2) != (id, p) =>
          s.zip(s2).takeWhile { case (x, y) => x == y }.size }.max)
      }
      val want = maxrep.groupBy(_._1).map { case (id, g) =>
        id -> ((g.map(_._2).max.toLong, g.count(_._2 >= 2).toLong)) }
      assert(got == want, s"trial=$trial")
    }
  }
}
