package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The PNG ENCODER contract ([[Multimodal.PngCodec.encodeRgb]] — the
  * write side of container normalization), pinned four ways:
  *  1. our own decoder inverts it exactly on full-color content;
  *  2. the JDK's ImageIO reader accepts the bytes and sees the same
  *     pixels — proving real zlib framing, CRCs, and Adler-32, not
  *     just self-consistency;
  *  3. the multi-block stored path (raw > 65535) round-trips both
  *     ways, and the output length is the documented closed form
  *     63 + raw + 5·ceil(raw/65535);
  *  4. the transcode composition decode(encodeRgb(decode(gif/bmp/
  *     jpeg))) preserves every pixel, and bad dims reject loudly.
  */
class PngEncodeSpec extends AnyFunSuite {

  private def colorPix(x: Int, y: Int): Int =
    (((x * 7 + y * 3) % 256) << 16) | (((x * 13 + y * 31) % 256) << 8) |
      ((x * 5 + y * 17 + 11) % 256)

  test("our decoder inverts encodeRgb on full-color content") {
    for ((w, h) <- Seq((1, 1), (17, 9), (40, 25))) {
      val px = Array.tabulate(w * h)(k => colorPix(k % w, k / w))
      val png = Multimodal.PngCodec.encodeRgb(w, h, px)
      val (dw, dh, qx) = Multimodal.PngCodec.decode(png)
      assert((dw, dh) == ((w, h)))
      assert(qx.sameElements(px))
      val raw = h * (3 * w + 1)
      assert(png.length == 63 + raw + 5 * ((raw + 65534) / 65535))
    }
  }

  test("the JDK's own PNG reader accepts the bytes and sees the same pixels") {
    val (w, h) = (37, 21)
    val px = Array.tabulate(w * h)(k => colorPix(k % w, k / w))
    val png = Multimodal.PngCodec.encodeRgb(w, h, px)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img != null, "JDK rejected our PNG")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xffffff) == px(y * w + x), s"($x,$y)")
  }

  test("multi-block stored path: raw > 65535 round-trips both ways") {
    val (w, h) = (150, 150) // raw = 150*451 = 67650 -> 2 stored blocks
    val px = Array.tabulate(w * h)(k => colorPix(k % w, k / w))
    val png = Multimodal.PngCodec.encodeRgb(w, h, px)
    val raw = h * (3 * w + 1)
    assert(raw > 65535)
    assert(png.length == 63 + raw + 5 * 2)
    val (dw, dh, qx) = Multimodal.PngCodec.decode(png)
    assert((dw, dh) == ((w, h)) && qx.sameElements(px))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == w && img.getHeight == h)
    assert((img.getRGB(149, 149) & 0xffffff) == px(149 * w + 149))
  }

  test("transcode composition preserves pixels from every source codec") {
    val (w, h) = (20, 12)
    def pix(x: Int, y: Int) = (x * 7 + y * 13) % 256
    val sources = Seq(
      Multimodal.ImageHeader.encodeGif(w, h, pix),
      Multimodal.ImageHeader.encodeBmp(w, h, pix),
      JpegCodec.encodeJpegDcOnly(w, h, (bx, by) => (bx * 7 + by * 13) % 256))
    for (src <- sources) {
      val (sw, sh, spx) = Multimodal.decodeImage(src)
      val png = Multimodal.PngCodec.encodeRgb(sw, sh, spx)
      val (dw, dh, qx) = Multimodal.PngCodec.decode(png)
      assert((dw, dh) == ((sw, sh)))
      assert(qx.sameElements(spx))
    }
  }

  test("bad dims and pixel-count mismatches reject loudly") {
    intercept[IllegalArgumentException](
      Multimodal.PngCodec.encodeRgb(0, 4, Array.empty))
    intercept[IllegalArgumentException](
      Multimodal.PngCodec.encodeRgb(3, 3, new Array[Int](8)))
  }
}
