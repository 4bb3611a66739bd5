package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The animated-GIF frame contract ([[Multimodal.GifCodec.decodeFrames]]):
  *  1. every frame decodes independently with its placement, dims, and
  *     the preceding GCE delay — pixels exact against the fixture
  *     formulas, including sub-rectangle frames;
  *  2. the single-frame encoder's output decodes as one frame with
  *     delay 0, byte-identical pixels to [[Multimodal.GifCodec.decode]]
  *     (the refactor guard: writeGifImageData is shared);
  *  3. the JDK's own animated writer round-trips (genuinely compressed
  *     streams, real-world GCE layout);
  *  4. hostile inputs reject loudly: no frames, frame outside the
  *     screen, truncated sub-blocks. */
class GifFramesSpec extends AnyFunSuite {

  test("multi-frame fixture decodes every frame with placement and delay") {
    val (w, h) = (20, 12)
    def pix(f: Int)(x: Int, y: Int) = (f * 97 + x * 7 + y * 13) % 256
    val frames = Seq((0, 0, 20, 12, pix(0) _), (3, 2, 10, 6, pix(1) _),
      (5, 1, 8, 8, pix(2) _))
    val b = Multimodal.ImageHeader.encodeGifAnimated(w, h, frames.map {
      case (l, t, fw, fh, p) => (l, t, fw, fh, p)
    }, Seq(10, 25, 40))
    val (sw, sh, got) = Multimodal.GifCodec.decodeFrames(b)
    assert((sw, sh) == ((w, h)))
    assert(got.map(f => (f.index, f.left, f.top, f.w, f.h, f.delayCs)) ==
      List((0, 0, 0, 20, 12, 10), (1, 3, 2, 10, 6, 25), (2, 5, 1, 8, 8, 40)))
    for ((f, spec) <- got.zip(frames); y <- 0 until f.h; x <- 0 until f.w) {
      val g = spec._5(x, y)
      assert(f.px(y * f.w + x) == ((g << 16) | (g << 8) | g),
        s"frame ${f.index} ($x,$y)")
    }
  }

  test("single-frame encodeGif output = one frame, delay 0, decode parity") {
    val b = Multimodal.ImageHeader.encodeGif(17, 9,
      (x, y) => (x * 7 + y * 13) % 256)
    val (w, h, frames) = Multimodal.GifCodec.decodeFrames(b)
    assert((w, h) == ((17, 9)) && frames.length == 1)
    assert(frames.head.delayCs == 0)
    val (_, _, single) = Multimodal.GifCodec.decode(b)
    assert(frames.head.px.sameElements(single))
  }

  test("the JDK's own animated GIF writer round-trips") {
    val (w, h) = (16, 10)
    val imgs = (0 until 3).map { f =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, (f * 31 + x * 5 + y * 11) % 256)
      img
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    imgs.foreach(i => writer.writeToSequence(
      new javax.imageio.IIOImage(i, null, null), null))
    writer.endWriteSequence(); ios.close()
    val (sw, sh, frames) = Multimodal.GifCodec.decodeFrames(out.toByteArray)
    assert((sw, sh) == ((w, h)))
    assert(frames.length == 3)
    for ((f, fi) <- frames.zipWithIndex; y <- 0 until h; x <- 0 until w) {
      val expect = (fi * 31 + x * 5 + y * 11) % 256
      // JDK gray write -> palette round-trip preserves the gray value
      assert((f.px(y * f.w + x) & 0xff) == expect, s"frame $fi ($x,$y)")
    }
  }

  test("hostile: no frames, out-of-screen frame, truncation reject") {
    val good = Multimodal.ImageHeader.encodeGifAnimated(10, 10,
      Seq((0, 0, 10, 10, (x: Int, y: Int) => (x + y) % 256)), Seq(5))
    // replace the image descriptor with an immediate trailer
    val none = good.take(13 + 768) ++ Array[Byte](0x3b)
    val e1 = intercept[IllegalArgumentException](
      Multimodal.GifCodec.decodeFrames(none))
    assert(e1.getMessage.contains("before any image frame"))
    // move the frame outside the screen: left = 200
    val oob = good.clone()
    val desc = 13 + 768 + 8 // after header+GCT+GCE
    assert((oob(desc) & 0xff) == 0x2c)
    oob(desc + 1) = 200.toByte
    val e2 = intercept[IllegalArgumentException](
      Multimodal.GifCodec.decodeFrames(oob))
    assert(e2.getMessage.contains("outside"))
    // truncate mid-LZW
    val e3 = intercept[IllegalArgumentException](
      Multimodal.GifCodec.decodeFrames(good.take(good.length - 10)))
    assert(e3.getMessage.contains("truncated") ||
      e3.getMessage.contains("ended"))
  }
}
