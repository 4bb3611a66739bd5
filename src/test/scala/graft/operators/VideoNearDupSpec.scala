package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class VideoNearDupSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  // 3 scenes, 2 frames each; brightness jumps of 70 between scenes
  // guarantee cuts (gradient term < 50 cannot cancel 70 below the
  // 16 threshold: per-block |diff| >= 21); +1 within-scene wiggle
  // keeps mean diff at 1. 72x64 keeps dHash cells == DC blocks.
  private val mults = Array((3, 5), (7, 11), (13, 17))
  private def frame(s: Int, wig: Int, shift: Int,
      mx0: Int = -1, my0: Int = -1): Array[Byte] = {
    val (mx, my) = if (mx0 > 0) (mx0, my0) else mults(s)
    JpegCodec.encodeJpegDcOnly(72, 64,
      (bx, by) => 20 + s * 70 + (bx * mx + by * my) % 50 + wig + shift)
  }
  private def avi(frames: Seq[Array[Byte]], us: Int = 33000): Array[Byte] =
    graft.sources.Avi.encodeMjpeg(72, 64, us, frames)

  private def mediaOf(rows: (Long, Array[Byte])*) =
    rows.toSeq.toDF("media_id", "bytes")
      .withColumn("kind", org.apache.spark.sql.functions.lit("image"))

  test("signature: per-scene dHash; trim keeps suffix; brightness shift is invariant") {
    val base = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))))
    val trim = avi((1 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))), 40000)
    val bright = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 4), frame(s, 1, 4))), 25000)
    val m = mediaOf(1L -> base, 2L -> trim, 3L -> bright)
    val sig = Multimodal.videoSignature(m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getString(3)).toMap
    assert(sig.count(_._1._1 == 1L) == 3, "base must have 3 scenes")
    assert(sig.count(_._1._1 == 2L) == 2, "trim must have 2 scenes")
    // trim's scenes are base's scenes 1..2, re-indexed
    assert(sig((2L, 0L)) == sig((1L, 1L)) && sig((2L, 1L)) == sig((1L, 2L)))
    // +4 brightness: every hash bit-identical (strict < preserved)
    for (s <- 0L until 3L) assert(sig((3L, s)) == sig((1L, s)), s"scene $s")
    // distinct scenes hash differently (gradient multipliers differ)
    assert(Set(sig((1L, 0L)), sig((1L, 1L)), sig((1L, 2L))).size == 3)
  }

  test("near-dup pairs: trim and re-encode pair with base; distinct video does not") {
    val base = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))))
    val trim = avi((1 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))), 40000)
    val bright = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 4), frame(s, 1, 4))), 25000)
    val other = avi((0 until 3).flatMap(s =>
      Seq(frame(s, 0, 0, 23, 29), frame(s, 1, 0, 23, 29))))
    val m = mediaOf(1L -> base, 2L -> trim, 3L -> bright, 4L -> other)
    val pairs = Multimodal.videoNearDupPairs(m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs == Map((1L, 2L) -> 2L, (1L, 3L) -> 3L, (2L, 3L) -> 2L),
      pairs.toString)
  }

  test("alignment offsets adjudicate trim vs re-encode") {
    val base = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))))
    val trim = avi((1 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))), 40000)
    val bright = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 4), frame(s, 1, 4))), 25000)
    val m = mediaOf(1L -> base, 2L -> trim, 3L -> bright)
    val got = Multimodal.videoAlignOffsets(m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    // trim of base: its scene k IS base's scene k+1 -> offset -1 over
    // 2 scenes; the re-encode aligns at 0 across all 3; trim vs
    // re-encode at +1
    assert(got == Map((1L, 2L) -> ((-1L, 2L)), (1L, 3L) -> ((0L, 3L)),
      (2L, 3L) -> ((1L, 2L))), got.toString)
  }

  test("guard vetoes saturated scene-hash diversity loudly") {
    // 40 videos with DISTINCT hashes that all share their first three
    // bands (rows 0-5 carry one fixed gradient; rows 6-7 vary per
    // video) -> the candidate volume across distinct values is
    // quadratic and must veto at a tiny budget rather than run.
    // (Exact copies no longer trip the guard by design — the banded
    // join runs over distinct values, and duplicate mass only shows
    // up in the final owner expansion, which is true output.)
    def vframe(vid: Long, s: Int, shift: Int): Array[Byte] =
      JpegCodec.encodeJpegDcOnly(72, 64, (bx, by) =>
        20 + s * 70 + (bx * (if (by < 6) 7 else 7 + vid.toInt)) % 50 + shift)
    val m = mediaOf((1L to 40L).map { id =>
      id -> avi((0 until 2).flatMap(s =>
        Seq(vframe(id, s, 0), vframe(id, s, 1))))
    }: _*)
    val ex = intercept[GuardTrippedException] {
      Multimodal.videoNearDupPairs(m, maxAvgCandidatesPerRow = 4.0).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("candidate"), ex.getMessage)
    // exact-copy mass does NOT trip the guard: 40 identical videos =
    // one distinct hash set, zero banded candidates — the 780 true
    // pairs flow through the owner expansion
    val copies = mediaOf((1L to 40L).map { id =>
      id -> avi((0 until 2).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))))
    }: _*)
    assert(Multimodal.videoNearDupPairs(copies,
      maxAvgCandidatesPerRow = 4.0).count() == 40L * 39L / 2)
  }

  test("hamming cap beyond banded-exactness is rejected") {
    val ex = intercept[IllegalArgumentException] {
      Multimodal.videoNearDupPairs(mediaOf(), maxHamming = 4)
    }
    assert(ex.getMessage.contains("hamming 3"))
  }

  test("videoSignature spreads a single-split scan before decoding (r19 sf10 lesson)") {
    val base = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))))
    val target = spark.sessionState.conf.numShufflePartitions
    // past the rows-per-partition floor: full-width spread (the r19
    // sf10 regression this test exists for)
    val n = 512L * target + 1
    val one = mediaOf((1L to n).map(id => id -> base): _*).coalesce(1)
    assert(one.rdd.getNumPartitions == 1)
    // the decode input must be rebalanced to the session target — a
    // byte-sized scan must never serialize a per-row CPU chain
    val sig = Multimodal.videoSignature(one)
    assert(sig.rdd.getNumPartitions == target,
      s"decode ran on ${sig.rdd.getNumPartitions} partitions, want $target")
    assert(sig.count() == n * 3) // and still decodes correctly
    // sub-floor input (r21): no spread shuffle at all
    val tiny = mediaOf((1L to 8L).map(id => id -> base): _*).coalesce(1)
    assert(Multimodal.videoSignature(tiny).rdd.getNumPartitions == 1,
      "sub-floor input must not pay a spread shuffle")
  }

  test("one-pass adjudicated form == neardup JOIN align (single decode)") {
    val base = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))))
    val trim = avi((1 until 3).flatMap(s => Seq(frame(s, 0, 0), frame(s, 1, 0))), 40000)
    val bright = avi((0 until 3).flatMap(s => Seq(frame(s, 0, 4), frame(s, 1, 4))), 25000)
    val other = avi((0 until 3).flatMap(s =>
      Seq(frame(s, 0, 0, 23, 29), frame(s, 1, 0, 23, 29))))
    val m = mediaOf(1L -> base, 2L -> trim, 3L -> bright, 4L -> other)
    val composite = Multimodal.videoNearDupAdjudicated(m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val nd = Multimodal.videoNearDupPairs(m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val al = Multimodal.videoAlignOffsets(m)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    val joined = nd.keySet.intersect(al.keySet).map(k =>
      k -> ((nd(k), al(k)._1, al(k)._2))).toMap
    assert(composite == joined, s"composite=$composite joined=$joined")
    // and the planted story survives on the decision row: the trim
    // aligns at -1, the re-encode at 0
    assert(composite((1L, 2L)) == ((2L, -1L, 2L)))
    assert(composite((1L, 3L)) == ((3L, 0L, 3L)))
  }
}
