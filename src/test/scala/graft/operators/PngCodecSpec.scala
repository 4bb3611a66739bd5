package graft.operators

import org.scalatest.funsuite.AnyFunSuite

class PngCodecSpec extends AnyFunSuite {

  private def pix(id: Long)(x: Int, y: Int): Int =
    ((id * 31 + x * 7 + y * 13) % 256).toInt

  test("decode inverts encodePngStored (stored zlib, filter 0)") {
    for (id <- Seq(0L, 3L, 17L)) {
      val (w, h) = (16 + (id % 24).toInt, 10 + (id % 15).toInt)
      val bytes = Multimodal.ImageHeader.encodePngStored(w, h, pix(id))
      val (dw, dh, px) = Multimodal.PngCodec.decode(bytes)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val g = pix(id)(x, y)
        assert(px(y * w + x) == ((g << 16) | (g << 8) | g), s"id=$id ($x,$y)")
      }
    }
  }

  test("decode inverts encodePngStoredInterlaced (stored zlib, Adam7 order)") {
    for ((w, h) <- Seq((16, 10), (37, 23), (5, 3), (1, 1), (2, 9), (8, 8))) {
      val bytes =
        Multimodal.ImageHeader.encodePngStoredInterlaced(w, h, pix(7L))
      assert((bytes(8 + 4 + 4 + 12) & 0xff) == 1)
      val (dw, dh, px) = Multimodal.PngCodec.decode(bytes)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val g = pix(7L)(x, y)
        assert(px(y * w + x) == ((g << 16) | (g << 8) | g), s"${w}x$h ($x,$y)")
      }
    }
  }

  test("decode handles the JDK encoder's real deflate + adaptive filters") {
    def viaJdk(imgType: Int, w: Int, h: Int,
        f: (Int, Int) => Int): Unit = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y)
        if (imgType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setSample(x, y, 0, v)
        else img.setRGB(x, y, (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256))
      }
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      val (dw, dh, px) = Multimodal.PngCodec.decode(bos.toByteArray)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val expect =
          if (imgType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
            val v = f(x, y); (v << 16) | (v << 8) | v
          } else img.getRGB(x, y) & 0xffffff
        assert(px(y * w + x) == expect, s"($x,$y)")
      }
    }
    // gradients favor Sub/Up/Paeth filters; noise favors None —
    // the JDK encoder picks adaptively, covering the filter set
    viaJdk(java.awt.image.BufferedImage.TYPE_BYTE_GRAY, 64, 48,
      (x, y) => (x * 3 + y * 2) % 256)
    viaJdk(java.awt.image.BufferedImage.TYPE_BYTE_GRAY, 80, 60,
      (x, y) => ((x * 2654435761L + y * 40503L) % 256).toInt)
    viaJdk(java.awt.image.BufferedImage.TYPE_INT_RGB, 50, 40,
      (x, y) => (x * x + y * 5) % 256)
    viaJdk(java.awt.image.BufferedImage.TYPE_INT_ARGB, 30, 20,
      (x, y) => (x * 11 + y * 17) % 256) // color type 6, alpha dropped
  }

  test("hostile inputs reject loudly") {
    val good = Multimodal.ImageHeader.encodePngStored(12, 9, pix(5))
    def rejects(b: Array[Byte], what: String): Unit = {
      val e = intercept[IllegalArgumentException] {
        Multimodal.PngCodec.decode(b)
      }
      assert(e.getMessage.startsWith("PNG:"), s"$what: ${e.getMessage}")
    }
    rejects(good.take(4), "truncated signature")
    rejects(good.take(good.length - 16), "truncated mid-chunk")
    val flipped = good.clone()
    flipped(40) = (flipped(40) ^ 0x7f).toByte // inside IDAT payload
    rejects(flipped, "CRC mismatch")
    // undefined interlace method 2 (byte flip also breaks the IHDR
    // CRC; either named rejection is a loud stop)
    val il = good.clone()
    il(8 + 4 + 4 + 12) = 2 // IHDR data byte 12 (interlace), offset 28
    rejects(il, "interlace or CRC")
  }

  test("Adam7 interlace: decode inverts the JDK progressive encoder") {
    def viaJdkInterlaced(imgType: Int, w: Int, h: Int,
        f: (Int, Int) => Int): Unit = {
      val img = new java.awt.image.BufferedImage(w, h, imgType)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y)
        if (imgType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          img.getRaster.setSample(x, y, 0, v)
        else img.setRGB(x, y, (v << 16) | (((v * 3) % 256) << 8) | ((v * 7) % 256))
      }
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("png").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
      writer.dispose(); ios.close()
      val bytes = bos.toByteArray
      assert((bytes(8 + 4 + 4 + 12) & 0xff) == 1,
        "fixture is not actually interlaced")
      val (dw, dh, px) = Multimodal.PngCodec.decode(bytes)
      assert((dw, dh) == ((w, h)))
      for (y <- 0 until h; x <- 0 until w) {
        val expect =
          if (imgType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) {
            val v = f(x, y); (v << 16) | (v << 8) | v
          } else img.getRGB(x, y) & 0xffffff
        assert(px(y * w + x) == expect, s"${w}x$h ($x,$y)")
      }
    }
    // dims chosen to exercise pass geometry: multiples of 8, odd
    // remainders in both axes, and sizes < 8 where EARLY passes are
    // EMPTY (contribute zero scanlines)
    viaJdkInterlaced(java.awt.image.BufferedImage.TYPE_BYTE_GRAY, 64, 48,
      (x, y) => (x * 3 + y * 2) % 256)
    viaJdkInterlaced(java.awt.image.BufferedImage.TYPE_BYTE_GRAY, 37, 23,
      (x, y) => ((x * 2654435761L + y * 40503L) % 256).toInt)
    viaJdkInterlaced(java.awt.image.BufferedImage.TYPE_INT_RGB, 50, 41,
      (x, y) => (x * x + y * 5) % 256)
    viaJdkInterlaced(java.awt.image.BufferedImage.TYPE_INT_RGB, 5, 3,
      (x, y) => (x * 50 + y * 80) % 256)
    viaJdkInterlaced(java.awt.image.BufferedImage.TYPE_INT_RGB, 1, 1,
      (x, y) => 137)
    viaJdkInterlaced(java.awt.image.BufferedImage.TYPE_INT_RGB, 2, 9,
      (x, y) => (x * 100 + y * 20) % 256)
    viaJdkInterlaced(java.awt.image.BufferedImage.TYPE_INT_ARGB, 30, 20,
      (x, y) => (x * 11 + y * 17) % 256)
  }
}
