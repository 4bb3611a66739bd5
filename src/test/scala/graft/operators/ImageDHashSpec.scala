package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class ImageDHashSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mediaOf(rows: Seq[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    rows.toDF("media_id", "bytes")
      .selectExpr("media_id", "'image' AS kind", "bytes")
  }

  private def hashOf(df: DataFrame): Map[Long, (String, Long)] =
    Multimodal.imageDHash(df).collect()
      .map(r => r.getLong(0) -> (r.getString(3), r.getLong(4))).toMap

  test("strict left-to-right gradient hashes to all-ones") {
    val bytes = Multimodal.ImageHeader.encodePngStored(18, 16, (x, _) => x * 10)
    val m = hashOf(mediaOf(Seq(0L -> bytes)))
    assert(m(0L)._1 == "ffffffffffffffff")
  }

  test("same content through GIF, PNG, and DC-only JPEG collides (the cross-format dedup contract)") {
    val (w, h) = (33, 26)
    def bv(bx: Int, by: Int) = ((bx * 37 + by * 91 + 5) % 256)
    def pix(x: Int, y: Int) = bv(x / 8, y / 8)
    val payloads = Seq(
      1L -> Multimodal.ImageHeader.encodeGif(w, h, pix),
      2L -> Multimodal.ImageHeader.encodePngStored(w, h, pix),
      3L -> JpegCodec.encodeJpegDcOnly(w, h, bv))
    val m = hashOf(mediaOf(payloads))
    assert(m(1L)._1 == m(2L)._1 && m(2L)._1 == m(3L)._1,
      s"formats disagree: $m")
    assert(m.values.forall(_._2 == 3L), s"n_same_hash: $m")
  }

  test("global brightness shift leaves the gradient hash unchanged; different content differs") {
    val (w, h) = (27, 19)
    def pix(x: Int, y: Int) = (x * 5 + y * 3) % 200
    val base = Multimodal.ImageHeader.encodePngStored(w, h, pix)
    val brighter = Multimodal.ImageHeader.encodePngStored(w, h,
      (x, y) => pix(x, y) + 40) // stays in [40, 239]: no clamp, pure shift
    val other = Multimodal.ImageHeader.encodePngStored(w, h,
      (x, y) => ((x * 131 + y * 77) * 2654435761L % 256).toInt)
    val m = hashOf(mediaOf(Seq(10L -> base, 11L -> brighter, 12L -> other)))
    assert(m(10L)._1 == m(11L)._1, "brightness shift changed the hash")
    assert(m(10L)._1 != m(12L)._1, "unrelated content collided")
    assert(m(10L)._2 == 2L && m(12L)._2 == 1L)
  }

  test("near-dup pairs: local perturbation found, inversion rejected, no cartesian") {
    val (w, h) = (32, 24)
    def base(x: Int, y: Int) = (x * 3 + y * 11) % 200
    val near = Multimodal.ImageHeader.encodePngStored(w, h,
      (x, y) => base(x, y) + (if (x < 8 && y < 8) 16 else 0))
    val far = Multimodal.ImageHeader.encodePngStored(w, h,
      (x, y) => 255 - base(x, y))
    val unrelated = Multimodal.ImageHeader.encodePngStored(w, h,
      (x, y) => ((x * 2654435761L + y * 40503L) % 200).toInt)
    val df = mediaOf(Seq(
      0L -> Multimodal.ImageHeader.encodePngStored(w, h, base),
      1L -> near, 2L -> far, 3L -> unrelated))
    val pairs = Multimodal.imageNearDupPairs(df, maxHamming = 8)
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), "banded join degenerated to all-pairs")
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got.contains((0L, 1L)), s"perturbed near-dup not found: $got")
    assert(!got.keySet.exists { case (a, b) => a == 2L || b == 2L },
      s"inverted image reported as near-dup: $got")
  }

  test("near-dup guard: saturated hash diversity vetoes loudly by name, 0 disables") {
    // 40 identical images -> one hash cluster -> 780 true pairs,
    // 19.5 candidates/row: over a budget of 5, under 100
    val bytes = Multimodal.ImageHeader.encodePngStored(24, 16,
      (x, y) => (x * 9 + y * 5) % 200)
    val df = mediaOf((0L until 40L).map(_ -> bytes))
    val e = intercept[GuardTrippedException] {
      Multimodal.imageNearDupPairs(df, maxHamming = 8,
        maxAvgCandidatesPerRow = 5.0).collect()
    }
    assert(e.report.guard == "banded-dHash candidate", e.getMessage)
    assert(e.report.rows == 40L && e.report.tripped)
    // disabled guard: the same input runs and reports every pair
    val n = Multimodal.imageNearDupPairs(df, maxHamming = 8,
      maxAvgCandidatesPerRow = 0.0).count()
    assert(n == 40L * 39 / 2, s"expected all-pairs of the clique, got $n")
  }

  test("luma weighting: color pixels fold via (77R+150G+29B)>>8") {
    // two images identical in luma but different in raw channels must
    // collide; verify against a hand-computed 9x8-exact case
    val (w, h) = (18, 16)
    // gray ramp vs a color ramp with the same integer luma
    def gray(x: Int, y: Int) = x * 10
    val colorPng = { // R=x*10+2, G=x*10, B=x*10 -> luma (77*(v+2)+150v+29v)>>8 = v + (154+256v)>>8... compute exactly below
      // choose channels so (77R + 150G + 29B) >> 8 == x*10 exactly:
      // R=G=B=x*10 is gray; perturb R by +3 and B by -8:
      // 77*(v+3) + 150*v + 29*(v-8) = 256v + 231 - 232 = 256v - 1
      // -> (256v - 1) >> 8 = v - 1 for v>0 ... not equal; instead
      // perturb R +1, B -2: 256v + 77 - 58 = 256v + 19 -> >>8 = v. OK.
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = gray(x, y)
        img.setRGB(x, y, ((v + 1) << 16) | (v << 8) | (v - 2 max 0))
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val grayPng = Multimodal.ImageHeader.encodePngStored(w, h, gray)
    val m = hashOf(mediaOf(Seq(20L -> grayPng, 21L -> colorPng)))
    assert(m(20L)._1 == "ffffffffffffffff")
    assert(m(21L)._1 == m(20L)._1, "equal-luma color image diverged")
  }
}
