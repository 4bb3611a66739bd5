package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** Hand-pinned contracts for the two remaining normalization kernels:
  * [[Multimodal.imageLetterboxStats]] (centered square pad, exact
  * integer placement, pad-color term) and
  * [[Multimodal.audioTrimSilenceStats]] (full-window silence trim,
  * partial-tail boundary, all-silent input). */
class LetterboxTrimSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("letterbox-trim-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  test("letterbox centers a wide image and pins placement by checksum") {
    import spark.implicits._
    // 3x1 image [10, 20, 30] -> 3x3 canvas, ox=0, oy=1: cells 3,4,5
    val bmp = Multimodal.ImageHeader.encodeBmp(3, 1,
      (x, _) => Seq(10, 20, 30)(x))
    val r = Multimodal.imageLetterboxStats(
      Seq((1L, "image", bmp)).toDF("media_id", "kind", "bytes"))
      .collect().head
    assert(r.getAs[Long]("side") == 3)
    assert((r.getAs[Long]("offset_x"), r.getAs[Long]("offset_y")) == ((0L, 1L)))
    assert(r.getAs[Long]("checksum") == 4 * 10 + 5 * 20 + 6 * 30)
  }

  test("letterbox pad color contributes the complementary weight sum") {
    import spark.implicits._
    val bmp = Multimodal.ImageHeader.encodeBmp(3, 1,
      (x, _) => Seq(10, 20, 30)(x))
    val r0 = Multimodal.imageLetterboxStats(
      Seq((1L, "image", bmp)).toDF("media_id", "kind", "bytes"))
      .collect().head.getAs[Long]("checksum")
    val r7 = Multimodal.imageLetterboxStats(
      Seq((1L, "image", bmp)).toDF("media_id", "kind", "bytes"), padColor = 7)
      .collect().head.getAs[Long]("checksum")
    // canvas weights 1..9 sum 45; image cells carry weights 4,5,6
    assert(r7 - r0 == 7L * (45 - 4 - 5 - 6))
  }

  test("silence trim: hand case with lead, tail, and riding partial") {
    import spark.implicits._
    def wav(pcm: Array[Int]) = Multimodal.WavCodec.encodePcm16(16000, pcm)
    // window=4: [0,0,0,0 | 1,2,3,4 | 0,0,0,0] + partial [9]
    // windows: silent, loud, silent -> kept [4,8): lead 1, tail 1 cut,
    // partial dropped with the trailing silence
    val a = Array(0, 0, 0, 0, 1, 2, 3, 4, 0, 0, 0, 0, 9)
    // [1,2,3,4 | 0,0,0,0 missing] -> no tail windows: partial rides
    val b = Array(1, 2, 3, 4, 9)
    val rows = Multimodal.audioTrimSilenceStats(
      Seq((1L, "audio", wav(a)), (2L, "audio", wav(b)))
        .toDF("media_id", "kind", "bytes"),
      windowSamples = 4, energyThreshold = 0L)
      .collect().map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Long]("n_in"), r.getAs[Long]("n_kept"),
          r.getAs[Long]("n_lead_windows_cut"),
          r.getAs[Long]("n_tail_windows_cut"),
          r.getAs[Long]("energy"), r.getAs[Long]("checksum"))).toMap
    // a: kept [1,2,3,4]: energy 30, ck 1+4+9+16 = 30
    assert(rows(1L) == ((13L, 4L, 1L, 1L, 30L, 30L)), s"a: ${rows(1L)}")
    // b: kept [1,2,3,4,9]: energy 30+81, ck 30 + 5*9
    assert(rows(2L) == ((5L, 5L, 0L, 0L, 111L, 75L)), s"b: ${rows(2L)}")
  }

  test("silence trim: all-silent input keeps nothing") {
    import spark.implicits._
    val wav = Multimodal.WavCodec.encodePcm16(16000, Array.fill(12)(0))
    val r = Multimodal.audioTrimSilenceStats(
      Seq((1L, "audio", wav)).toDF("media_id", "kind", "bytes"),
      windowSamples = 4, energyThreshold = 0L).collect().head
    assert(r.getAs[Long]("n_kept") == 0)
    assert(r.getAs[Long]("n_lead_windows_cut") == 0)
    assert(r.getAs[Long]("n_tail_windows_cut") == 3)
    assert(r.getAs[Long]("energy") == 0 && r.getAs[Long]("checksum") == 0)
  }
}
