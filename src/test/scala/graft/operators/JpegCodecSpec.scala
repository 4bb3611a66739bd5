package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The JPEG contract, in two halves:
  *
  * 1. EXACT half — DC-only fixtures ([[JpegCodec.encodeJpegDcOnly]]):
  *    every conforming decoder reproduces the block values exactly, so
  *    these assert against the pixel FORMULA (and mm_jpeg_pixels reuses
  *    that as its DuckDB oracle).
  * 2. BYTE-IDENTITY half — arbitrary JDK-encoded baseline JPEGs
  *    (gradients/noise with real AC content, default 4:2:0 color,
  *    grayscale) plus DC-only color fixtures at 2x2/2x1/1x1 sampling:
  *    our decode must equal `ImageIO.read`'s output byte for byte,
  *    pinning the IJG slow-IDCT / triangle-upsample / fixed-point
  *    color-convert arithmetic to the decoder family the JDK bundles.
  */
class JpegCodecSpec extends AnyFunSuite {

  private def blockVal(id: Long)(bx: Int, by: Int): Int =
    ((id * 31 + bx * 7 + by * 13) % 256).toInt

  private def jdkDecode(b: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
    assert(img != null, "JDK refused the fixture bytes")
    val (w, h) = (img.getWidth, img.getHeight)
    val gray = img.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY
    val px = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        px(y * w + x) =
          if (gray) { // raw decoded samples, NOT getRGB's gray->sRGB remap
            val g = img.getRaster.getSample(x, y, 0)
            (g << 16) | (g << 8) | g
          } else img.getRGB(x, y) & 0xffffff
        x += 1
      }
      y += 1
    }
    (w, h, px)
  }

  private def assertSame(ours: (Int, Int, Array[Int]),
      jdk: (Int, Int, Array[Int]), what: String): Unit = {
    assert((ours._1, ours._2) == ((jdk._1, jdk._2)), s"$what dims")
    val w = ours._1
    var i = 0
    while (i < ours._3.length) {
      assert(ours._3(i) == jdk._3(i),
        f"$what (${i % w},${i / w}): ours 0x${ours._3(i)}%06x jdk 0x${jdk._3(i)}%06x")
      i += 1
    }
  }

  test("DC-only round trip is the exact formula (incl. partial edge blocks)") {
    for (id <- Seq(0L, 3L, 17L, 42L); (w, h) <- Seq((16, 10), (37, 23), (8, 8), (1, 1), (9, 17))) {
      val bytes = JpegCodec.encodeJpegDcOnly(w, h, blockVal(id))
      val (dw, dh, px) = JpegCodec.decode(bytes)
      assert((dw, dh) == ((w, h)), s"id=$id ${w}x$h")
      for (y <- 0 until h; x <- 0 until w) {
        val g = blockVal(id)(x / 8, y / 8)
        assert(px(y * w + x) == ((g << 16) | (g << 8) | g), s"id=$id ($x,$y)")
      }
    }
  }

  test("DC-only fixtures are real JPEGs: the JDK decoder agrees exactly") {
    for (id <- Seq(5L, 29L); (w, h) <- Seq((24, 18), (33, 9))) {
      val bytes = JpegCodec.encodeJpegDcOnly(w, h, blockVal(id))
      assertSame(JpegCodec.decode(bytes), jdkDecode(bytes), s"dc id=$id ${w}x$h")
    }
  }

  test("restart markers: RSTn cadence + predictor reset, formula- and JDK-checked") {
    for (ri <- Seq(1, 3, 7); (w, h) <- Seq((40, 24), (17, 33))) {
      val bytes = JpegCodec.encodeJpegDcOnly(w, h, blockVal(11L), restartInterval = ri)
      val (dw, dh, px) = JpegCodec.decode(bytes)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val g = blockVal(11L)(x / 8, y / 8)
        assert(px(y * w + x) == ((g << 16) | (g << 8) | g), s"ri=$ri ($x,$y)")
      }
      assertSame(JpegCodec.decode(bytes), jdkDecode(bytes), s"rst ri=$ri ${w}x$h")
    }
  }

  test("DC-only color at 2x2, 2x1, 1x1 sampling: byte-identical to the JDK") {
    // known plane content + unknown-but-shared reconstruction: both
    // decoders run triangle upsample + fixed-point YCbCr->RGB, so any
    // arithmetic drift in either stage shows as a pixel diff
    def cb(id: Long)(bx: Int, by: Int): Int = ((id * 11 + bx * 29 + by * 3) % 256).toInt
    def cr(id: Long)(bx: Int, by: Int): Int = ((id * 7 + bx * 5 + by * 23) % 256).toInt
    for ((sh, sv) <- Seq((2, 2), (2, 1), (1, 2), (1, 1));
        (w, h) <- Seq((48, 32), (35, 21))) {
      val bytes = JpegCodec.encodeJpegDcOnlyColor(w, h, sh, sv,
        blockVal(13L), cb(13L), cr(13L))
      assertSame(JpegCodec.decode(bytes), jdkDecode(bytes), s"color ${sh}x$sv ${w}x$h")
    }
  }

  test("JDK-encoded grayscale (real FDCT, AC content): byte-identical decode") {
    def encGray(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w) img.getRaster.setSample(x, y, 0, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    // gradient (smooth AC), noise (dense AC), and a non-multiple-of-8 size
    for ((w, h, f) <- Seq[(Int, Int, (Int, Int) => Int)](
        (64, 48, (x, y) => (x * 3 + y * 2) % 256),
        (80, 56, (x, y) => ((x * 2654435761L + y * 40503L) % 256).toInt),
        (37, 29, (x, y) => (x * x + y * 5) % 256))) {
      val bytes = encGray(w, h, f)
      assertSame(JpegCodec.decode(bytes), jdkDecode(bytes), s"gray ${w}x$h")
    }
  }

  test("JDK-encoded RGB (default writer: subsampled color): byte-identical decode") {
    def encRgb(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y)
        img.setRGB(x, y, (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256))
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "jpg", bos))
      bos.toByteArray
    }
    for ((w, h, f) <- Seq[(Int, Int, (Int, Int) => Int)](
        (64, 48, (x, y) => (x * 5 + y * 9) % 256),
        (50, 38, (x, y) => ((x * 2654435761L + y * 40503L) % 256).toInt),
        (33, 27, (x, y) => (x * y + x + 3 * y) % 256))) {
      val bytes = encRgb(w, h, f)
      assertSame(JpegCodec.decode(bytes), jdkDecode(bytes), s"rgb ${w}x$h")
    }
  }

  test("stripMetadata removes APPn/COM only, preserves pixels, is idempotent") {
    // JDK-encoded color JPEG: the writer emits a JFIF APP0 the strip
    // must remove while the scan survives byte-identical decode
    val img = new java.awt.image.BufferedImage(
      40, 30, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 30; x <- 0 until 40) {
      val v = (x * 5 + y * 9) % 256
      img.setRGB(x, y, (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val original = bos.toByteArray
    val (stripped, n) = JpegCodec.stripMetadata(original)
    assert(n >= 1, "JDK writer emits at least APP0, nothing removed")
    assert(stripped.length < original.length)
    assertSame(JpegCodec.decode(stripped), JpegCodec.decode(original), "strip")
    // both decoders accept the stripped file
    assertSame(JpegCodec.decode(stripped), jdkDecode(stripped), "strip-jdk")
    // idempotent
    val (again, n2) = JpegCodec.stripMetadata(stripped)
    assert(n2 == 0 && java.util.Arrays.equals(again, stripped))
    // restart-marker streams survive the scan copy-through
    val rst = JpegCodec.encodeJpegDcOnly(40, 24, blockVal(11L), restartInterval = 2)
    val (rstStripped, _) = JpegCodec.stripMetadata(rst)
    assertSame(JpegCodec.decode(rstStripped), JpegCodec.decode(rst), "rst strip")
    // hostile: truncated scan rejects loudly
    val e = intercept[IllegalArgumentException] {
      JpegCodec.stripMetadata(rst.take(rst.length - 3))
    }
    assert(e.getMessage.startsWith("JPEG:"), e.getMessage)
  }

  test("progressive (SOF2) rejects loudly by name") {
    val img = new java.awt.image.BufferedImage(
      32, 24, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 24; x <- 0 until 32)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 3) % 256)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    writer.setOutput(javax.imageio.ImageIO.createImageOutputStream(bos))
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    writer.dispose()
    val e = intercept[IllegalArgumentException] { JpegCodec.decode(bos.toByteArray) }
    assert(e.getMessage.contains("progressive"), e.getMessage)
  }

  test("hostile inputs reject loudly with offsets") {
    val good = JpegCodec.encodeJpegDcOnly(24, 16, blockVal(3L))
    def rejects(b: Array[Byte], what: String): String = {
      val e = intercept[IllegalArgumentException] { JpegCodec.decode(b) }
      assert(e.getMessage.startsWith("JPEG:"), s"$what: ${e.getMessage}")
      e.getMessage
    }
    rejects(Array[Byte](0, 1, 2, 3), "bad SOI")
    rejects(good.take(good.length - 4), "truncated entropy data")
    // 12-bit precision: SOF precision byte is right after the SOF0
    // marker+length (find it structurally, not at a magic offset)
    val sof = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xc0)) i += 1
      i
    }
    val deep = good.clone(); deep(sof + 4) = 12
    assert(rejects(deep, "12-bit").contains("precision 12"))
    // corrupt SOS length -> named reject, not an array overrun
    val sos = {
      var i = 2
      while (!((good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)) i += 1
      i
    }
    val badSos = good.clone(); badSos(sos + 3) = (badSos(sos + 3) + 2).toByte
    assert(rejects(badSos, "SOS length").contains("SOS length"))
    // second SOF
    val dup = (good.take(sof) ++ good.slice(sof, sof + 13) ++ good.drop(sof)).toArray
    assert(rejects(dup, "double SOF").contains("multiple SOF"))
  }
}
