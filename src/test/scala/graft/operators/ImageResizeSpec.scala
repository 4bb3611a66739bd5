package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The box-mean thumbnail kernel: identity at equal dims, exact
  * floor means on hand-checkable grids, per-CHANNEL correctness on
  * real color streams (brute-force reference recomputed in the
  * test), grid arithmetic lockstep with the dHash 9x8 cells, and the
  * downsample-only contract rejecting upsamples loudly. */
class ImageResizeSpec extends AnyFunSuite {

  test("resize to the same dims is the identity") {
    val w = 13; val h = 9
    val px = Array.tabulate(w * h) { k =>
      val x = k % w; val y = k / w
      ((x * 41 + y) % 256 << 16) | ((y * 17 + x) % 256 << 8) | ((x + y * 3) % 256)
    }
    assert(Multimodal.resizePixels(px, w, h, w, h).sameElements(px))
  }

  test("hand case: 4x2 -> 2x1 floor means per cell") {
    // cells: {10,20,30,40} -> 25, {100,101,102,255} -> 139 (558/4=139.5 -> 139)
    val px = Array(10, 20, 100, 101, 30, 40, 102, 255)
    val out = Multimodal.resizePixels(px, 4, 2, 2, 1)
    assert((out(0) & 0xff) == 25 && (out(1) & 0xff) == 139)
    // and each channel averages independently: r=g=b here since the
    // values above only populate the low byte
    assert(out(0) == 25 && out(1) == 139)
  }

  test("per-channel means on a JDK-written color BMP match brute force") {
    val (w, h, tw, th) = (37, 23, 9, 7)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, (((x * 7 + y * 3) % 256) << 16) |
        (((y * 11 + x) % 256) << 8) | ((x * x + y) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos))
    val (dw, dh, px) = Multimodal.decodeImage(bos.toByteArray)
    assert((dw, dh) == ((w, h)))
    val out = Multimodal.resizePixels(px, w, h, tw, th)
    // brute-force reference: per-cell per-channel floor mean
    val rs = Array.fill(tw * th)(0L); val gs = Array.fill(tw * th)(0L)
    val bs = Array.fill(tw * th)(0L); val cn = Array.fill(tw * th)(0L)
    for (y <- 0 until h; x <- 0 until w) {
      val k = (y * th / h) * tw + (x * tw / w)
      val p = px(y * w + x)
      rs(k) += (p >> 16) & 0xff; gs(k) += (p >> 8) & 0xff; bs(k) += p & 0xff
      cn(k) += 1
    }
    for (k <- 0 until tw * th)
      assert(out(k) == (((rs(k) / cn(k)).toInt << 16) |
        ((gs(k) / cn(k)).toInt << 8) | (bs(k) / cn(k)).toInt), s"cell $k")
  }

  test("a 9x8 resize of a gray image reproduces the dHash grid cells") {
    val (w, h) = (31, 18)
    def pix(x: Int, y: Int) = (x * 5 + y * 9) % 256
    val px = Array.tabulate(w * h)(k => {
      val g = pix(k % w, k / w); (g << 16) | (g << 8) | g
    })
    val out = Multimodal.resizePixels(px, w, h, 9, 8)
    // recompute the dHash cell means directly (luma == gray value)
    val sums = Array.fill(72)(0L); val cnts = Array.fill(72)(0L)
    for (y <- 0 until h; x <- 0 until w) {
      val k = (y * 8 / h) * 9 + (x * 9 / w)
      sums(k) += pix(x, y); cnts(k) += 1
    }
    for (k <- 0 until 72)
      assert((out(k) & 0xff).toLong == sums(k) / cnts(k), s"cell $k")
  }

  test("upsampling rejects loudly; zero target rejects") {
    val px = Array.fill(12)(0)
    val e = intercept[IllegalArgumentException] {
      Multimodal.resizePixels(px, 4, 3, 5, 3)
    }
    assert(e.getMessage.contains("upsampling"))
    intercept[IllegalArgumentException] {
      Multimodal.resizePixels(px, 4, 3, 4, 0)
    }
  }
}
