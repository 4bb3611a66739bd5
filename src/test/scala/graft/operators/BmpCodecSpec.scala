package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The BMP contract, pinned the same three ways as the other three
  * still-image codecs:
  *  1. decode inverts our own [[Multimodal.ImageHeader.encodeBmp]]
  *     fixture encoder exactly (gray pixels, bottom-up rows);
  *  2. decode is BYTE-IDENTICAL to the JDK's own BMP reader on
  *     streams the JDK's BMP WRITER produced (real color content,
  *     odd widths so the 4-byte row padding actually matters);
  *  3. anything outside the 24-bit BI_RGB contract rejects loudly
  *     by name with the offending offset.
  */
class BmpCodecSpec extends AnyFunSuite {

  private def pix(id: Long)(x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  test("decode inverts encodeBmp (gray, bottom-up, padded rows)") {
    for (id <- Seq(0L, 3L, 17L, 41L)) {
      val (w, h) = (16 + (id % 24).toInt, 10 + (id % 15).toInt)
      val bytes = Multimodal.ImageHeader.encodeBmp(w, h, pix(id))
      assert(bytes.length == 54 + ((w * 3 + 3) & ~3) * h)
      val (dw, dh, px) = Multimodal.BmpCodec.decode(bytes)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val g = pix(id)(x, y)
        assert(px(y * w + x) == ((g << 16) | (g << 8) | g), s"id=$id ($x,$y)")
      }
    }
  }

  test("decode matches the JDK's own BMP reader on JDK-written color streams") {
    // odd widths: stride padding 1..3 bytes; full-color pixels pin
    // the BGR->RGB channel order
    for ((w, h) <- Seq((33, 20), (34, 7), (35, 3), (64, 48))) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 7 + y) % 256; val g = (y * 13 + x) % 256
        val b = (x * x + y * 3) % 256
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "bmp", bos))
      val bytes = bos.toByteArray
      val jdk = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      val (dw, dh, px) = Multimodal.BmpCodec.decode(bytes)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert(px(y * w + x) == (jdk.getRGB(x, y) & 0xffffff),
          s"${w}x$h ($x,$y)")
    }
  }

  test("negative height means top-down row order") {
    val (w, h) = (5, 4)
    val up = Multimodal.ImageHeader.encodeBmp(w, h, (x, y) => x + y * 16)
    // flip to top-down: height := -h, rows already in bottom-up file
    // order now read as top-down, so the image comes back V-FLIPPED
    val down = up.clone()
    val neg = -h
    down(22) = neg.toByte; down(23) = (neg >> 8).toByte
    down(24) = (neg >> 16).toByte; down(25) = (neg >> 24).toByte
    val (_, _, pxUp) = Multimodal.BmpCodec.decode(up)
    val (dw, dh, pxDown) = Multimodal.BmpCodec.decode(down)
    assert((dw, dh) == ((w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert(pxDown(y * w + x) == pxUp((h - 1 - y) * w + x), s"($x,$y)")
  }

  test("out-of-contract inputs reject loudly by name") {
    val good = Multimodal.ImageHeader.encodeBmp(12, 9, pix(5))
    def rejects(b: Array[Byte], needle: String, what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Multimodal.BmpCodec.decode(b)
      }
      assert(e.getMessage.startsWith("BMP:") && e.getMessage.contains(needle),
        s"$what: ${e.getMessage}")
    }
    rejects(good.take(10), "bad signature", "truncated header")
    rejects("XX".getBytes("US-ASCII") ++ good.drop(2), "bad signature", "sig")
    rejects(good.take(good.length - 8), "overruns", "truncated pixels")
    val bpp8 = good.clone(); bpp8(28) = 8
    rejects(bpp8, "8 bpp", "palettized")
    val rle = good.clone(); rle(30) = 1
    rejects(rle, "compression 1", "RLE")
    val core = good.clone(); core(14) = 12; core(15) = 0
    rejects(core, "DIB header size 12", "BITMAPCOREHEADER")
    val zeroW = good.clone()
    zeroW(18) = 0; zeroW(19) = 0; zeroW(20) = 0; zeroW(21) = 0
    rejects(zeroW, "out of contract", "zero width")
  }

  test("decodeImage dispatches BMP by signature") {
    val b = Multimodal.ImageHeader.encodeBmp(6, 5, (x, y) => x * 40 + y)
    val (w, h, _) = Multimodal.decodeImage(b)
    assert((w, h) == ((6, 5)))
    val e = intercept[IllegalArgumentException] {
      Multimodal.decodeImage("QQ random bytes".getBytes("US-ASCII"))
    }
    assert(e.getMessage.contains("BMP"))
  }
}
