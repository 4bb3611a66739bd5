package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The skin-ratio safety-slot contract ([[Multimodal.imageSkinRatio]]):
  * every clause of the Peer/Kovac rule load-bearing at its boundary,
  * floor-ppm arithmetic, the strict flag threshold, PNG/BMP color
  * carrier parity, and the color BMP encoder's channel order. */
class SkinRatioSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("skin-ratio-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("media_id", "bytes")
      .withColumn("kind", org.apache.spark.sql.functions.lit("image"))
  }

  private def statsOfPixels(px: Array[Int], w: Int, h: Int) = {
    val png = Multimodal.PngCodec.encodeRgb(w, h, px)
    Multimodal.imageSkinRatio(mediaOf(Seq((1L, png)))).collect().head
  }

  test("each rule clause is load-bearing at its boundary") {
    val skin = (200 << 16) | (120 << 8) | 80 // clearly skin by the rule
    val cases = Seq(
      skin -> true,
      ((95 << 16) | (40 << 8) | 30) -> false,   // R not > 95
      ((200 << 16) | (40 << 8) | 80) -> false,  // G not > 40
      ((200 << 16) | (120 << 8) | 20) -> false, // B not > 20
      ((120 << 16) | (105 << 8) | 106) -> false, // max-min = 15, not > 15
      ((120 << 16) | (105 << 8) | 50) -> false, // |R-G| = 15, not > 15
      ((120 << 16) | (140 << 8) | 50) -> false, // R not > G
      ((120 << 16) | (96 << 8) | 130) -> false) // R not > B
    cases.zipWithIndex.foreach { case ((p, expected), i) =>
      val r = statsOfPixels(Array.fill(4)(p), 2, 2)
      assert((r.getAs[Long]("n_skin") == 4) == expected,
        s"case $i: pixel 0x${p.toHexString} expected skin=$expected")
    }
  }

  test("floor ppm and the STRICT flag threshold") {
    val skin = (200 << 16) | (120 << 8) | 80
    val non = 0
    // 1 of 5 skin: 200000 ppm exactly -> NOT flagged (strict >)
    val r5 = statsOfPixels(Array(skin, non, non, non, non), 5, 1)
    assert(r5.getAs[Long]("skin_ppm") == 200000)
    assert(!r5.getAs[Boolean]("flagged"))
    // 2 of 5: 400000 -> flagged
    val r25 = statsOfPixels(Array(skin, skin, non, non, non), 5, 1)
    assert(r25.getAs[Boolean]("flagged"))
    // floor: 1 of 3 = 333333 (not 333334)
    val r3 = statsOfPixels(Array(skin, non, non), 3, 1)
    assert(r3.getAs[Long]("skin_ppm") == 333333)
  }

  test("PNG and BMP color carriers decode to identical ratios") {
    def rgb(x: Int, y: Int): Int =
      (((x * 53 + y * 91 + 31) % 256) << 16) |
        (((x * 29 + y * 17 + 7) % 256) << 8) | ((x * 11 + y * 43) % 256)
    val w = 9; val h = 7
    val png = Multimodal.PngCodec.encodeRgb(w, h,
      Array.tabulate(w * h)(k => rgb(k % w, k / w)))
    val bmp = Multimodal.ImageHeader.encodeBmpRgb(w, h, rgb)
    val rows = Multimodal.imageSkinRatio(mediaOf(Seq((1L, png), (2L, bmp))))
      .collect().map(r => (r.getAs[Long]("n_px"), r.getAs[Long]("n_skin"),
        r.getAs[Long]("skin_ppm"))).toSet
    assert(rows.size == 1, s"carriers disagreed: $rows")
  }

  test("encodeBmpRgb channel order survives the real BMP decoder") {
    // a single red pixel: if B/R were swapped the rule flips
    val bmp = Multimodal.ImageHeader.encodeBmpRgb(1, 1, (_, _) => 0xc87850)
    val (w, h, px) = Multimodal.decodeImage(bmp)
    assert((w, h) == (1, 1) && px(0) == 0xc87850)
  }
}
