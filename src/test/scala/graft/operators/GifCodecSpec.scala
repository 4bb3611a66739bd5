package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class GifCodecSpec extends AnyFunSuite {

  private def pix(id: Long)(x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  test("decode inverts encodeGif (literal subset with CLEAR resets)") {
    for (id <- Seq(0L, 3L, 17L)) {
      val (w, h) = (16 + (id % 24).toInt, 10 + (id % 15).toInt)
      val bytes = Multimodal.ImageHeader.encodeGif(w, h, pix(id))
      val (dw, dh, px) = Multimodal.GifCodec.decode(bytes)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val g = pix(id)(x, y)
        assert(px(y * w + x) == ((g << 16) | (g << 8) | g),
          s"id=$id ($x,$y)")
      }
    }
  }

  test("decode handles the JDK encoder's REAL compressed LZW streams") {
    // repetitive stripes force long dictionary chains and the KwKwK
    // case; the noisy image exercises width growth to 12 bits
    def viaJdk(w: Int, h: Int, f: (Int, Int) => Int): Unit = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until h; x <- 0 until w)
        img.getRaster.setSample(x, y, 0, f(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "gif", bos))
      val (dw, dh, px) = Multimodal.GifCodec.decode(bos.toByteArray)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w)
        assert((px(y * w + x) & 0xff) == f(x, y), s"($x,$y)")
    }
    viaJdk(64, 48, (x, _) => if ((x / 8) % 2 == 0) 40 else 200) // stripes
    viaJdk(80, 60, (x, y) => (x * x * 7 + y * y * 13 + x * y) % 256)
    viaJdk(300, 200, (x, y) => ((x * 2654435761L + y * 40503L) % 256).toInt)
  }

  test("interlaced frames come back in display order") {
    // literal-code body with the rows emitted in interlace pass order
    // and the interlace flag set
    val (w, h) = (8, 11)
    val rows = Seq(0, 8, 4, 2, 6, 10, 1, 3, 5, 7, 9) // pass order for h=11
    val out = new java.io.ByteArrayOutputStream()
    def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII")); le16(w); le16(h)
    out.write(0xf7); out.write(0); out.write(0)
    (0 until 256).foreach(i => { out.write(i); out.write(i); out.write(i) })
    out.write(0x2c); le16(0); le16(0); le16(w); le16(h)
    out.write(0x40) // interlaced, no local table
    out.write(8)
    val codes = new java.io.ByteArrayOutputStream()
    var acc = 0L; var nbits = 0
    def emit(c: Int): Unit = {
      acc |= c.toLong << nbits; nbits += 9
      while (nbits >= 8) { codes.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8 }
    }
    emit(256)
    var since = 0
    for (y <- rows; x <- 0 until w) {
      emit((y * 10 + x) % 256)
      since += 1
      if (since == 250) { emit(256); since = 0 }
    }
    emit(257)
    if (nbits > 0) codes.write((acc & 0xff).toInt)
    val cb = codes.toByteArray
    var o = 0
    while (o < cb.length) {
      val n = math.min(255, cb.length - o)
      out.write(n); out.write(cb, o, n); o += n
    }
    out.write(0); out.write(0x3b)
    val (dw, dh, px) = Multimodal.GifCodec.decode(out.toByteArray)
    assert((dw, dh) == ((w, h)))
    for (y <- 0 until h; x <- 0 until w)
      assert((px(y * w + x) & 0xff) == (y * 10 + x) % 256, s"($x,$y)")
  }

  test("hostile inputs reject loudly with offsets") {
    val good = Multimodal.ImageHeader.encodeGif(12, 9, pix(5))
    def rejects(b: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Multimodal.GifCodec.decode(b)
      }
      assert(e.getMessage.startsWith("GIF:"), s"$what: ${e.getMessage}")
    }
    rejects(good.take(4), "truncated header")
    rejects(good.take(good.length - 12), "truncated stream")
    rejects("NOTGIF".getBytes("US-ASCII") ++ good.drop(6), "bad signature")
    // trailer immediately after the header + palette: no frame
    rejects(good.take(13 + 768) :+ 0x3b.toByte, "no frame")
    // frame that does not cover the screen
    val off = good.clone()
    off(13 + 768 + 1) = 2 // image-left = 2
    rejects(off, "offset frame")
  }

  test("stripMetadata drops comment/application/plain-text blocks only, keeps pixels") {
    def pix(x: Int, y: Int) = (x * 7 + y * 13) % 256
    val base = Multimodal.ImageHeader.encodeGif(20, 14, pix)
    val at = 13 + 3 * (1 << ((base(10) & 7) + 1))
    def ext(label: Int, blocks: Array[Byte]*): Array[Byte] =
      Array[Byte](0x21, label.toByte) ++
        blocks.flatMap(d => d.length.toByte +: d) ++ Array[Byte](0)
    val gce = ext(0xf9, Array[Byte](0, 0, 0, 0)) // graphic control: KEPT
    val withMeta = base.take(at) ++
      ext(0xfe, "gps here".getBytes("US-ASCII")) ++
      ext(0xff, "XMP DataXMP".getBytes("US-ASCII"), Array.tabulate(30)(_.toByte)) ++
      gce ++ base.drop(at)
    val (stripped, n) = Multimodal.GifCodec.stripMetadata(withMeta)
    assert(n == 2)
    assert(java.util.Arrays.equals(stripped, base.take(at) ++ gce ++ base.drop(at)),
      "strip must keep the GCE and drop exactly the two metadata blocks")
    val (w, h, px1) = Multimodal.GifCodec.decode(stripped)
    assert((w, h) == ((20, 14)))
    assert(px1.sameElements(Multimodal.GifCodec.decode(base)._3))
    // idempotent
    val (again, n2) = Multimodal.GifCodec.stripMetadata(stripped)
    assert(n2 == 0 && java.util.Arrays.equals(again, stripped))
    // hostile: trailing bytes after trailer and truncation reject
    intercept[IllegalArgumentException] {
      Multimodal.GifCodec.stripMetadata(withMeta ++ Array[Byte](7))
    }
    intercept[IllegalArgumentException] {
      Multimodal.GifCodec.stripMetadata(withMeta.take(withMeta.length - 9))
    }
  }
}
