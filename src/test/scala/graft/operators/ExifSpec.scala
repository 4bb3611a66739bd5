package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The EXIF contract, pinned four ways:
  *  1. [[Exif.parseTiff]] inverts [[Exif.encodeTiff]] exactly in BOTH
  *     byte orders, with and without the GPS sub-IFD, across the
  *     inline (<=4 byte) and offset ASCII value paths;
  *  2. the milli-arc-second composition is the documented floor
  *     formula, including non-unit denominators and S/W sign flips;
  *  3. both carriers round-trip — JPEG APP1 (found by the marker
  *     walk, gone after [[JpegCodec.stripMetadata]]) and the PNG eXIf
  *     chunk (CRC-validated, gone after
  *     [[Multimodal.PngCodec.stripMetadata]]) — so detection and
  *     scrub compose;
  *  4. hostile structures reject loudly by name: bad byte-order mark,
  *     wrong magic, out-of-bounds IFD and value offsets, zero-
  *     denominator and oversized rationals, corrupt chunk CRC.
  */
class ExifSpec extends AnyFunSuite {

  private val gps = Exif.GpsDms('N', 40, 26, 46, 'E', 79, 58, 56)

  test("parseTiff inverts encodeTiff in both byte orders") {
    for (le <- Seq(true, false)) {
      val t = Exif.encodeTiff(le, orientation = 6, make = "CamCo",
        model = "Model-X", gps = Some(gps))
      val e = Exif.parseTiff(t, 0, t.length)
      assert(e.littleEndian == le)
      assert(e.orientation == 6)
      assert(e.make == "CamCo")
      assert(e.model == "Model-X")
      assert(e.hasGps)
      assert(e.gpsLatMas == 40L * 3600000 + 26L * 60000 + 46L * 1000)
      assert(e.gpsLonMas == 79L * 3600000 + 58L * 60000 + 56L * 1000)
    }
  }

  test("GPS absent: hasGps false, coordinates zero") {
    val t = Exif.encodeTiff(littleEndian = true, orientation = 1,
      make = "A", model = "B", gps = None)
    val e = Exif.parseTiff(t, 0, t.length)
    assert(!e.hasGps && e.gpsLatMas == 0 && e.gpsLonMas == 0)
    // 1-char strings + NUL = 2 bytes -> the INLINE ASCII path
    assert(e.make == "A" && e.model == "B")
  }

  test("S/W references negate the milli-arc-second values") {
    val t = Exif.encodeTiff(littleEndian = false, orientation = 1,
      make = "c", model = "m",
      gps = Some(Exif.GpsDms('S', 33, 52, 4, 'W', 151, 12, 36)))
    val e = Exif.parseTiff(t, 0, t.length)
    assert(e.gpsLatMas == -(33L * 3600000 + 52L * 60000 + 4L * 1000))
    assert(e.gpsLonMas == -(151L * 3600000 + 12L * 60000 + 36L * 1000))
  }

  test("non-unit denominators floor-compose (sec = 4572/100)") {
    // hand-build a TIFF whose seconds rational is 4572/100 = 45.72 s:
    // patch the encoded den=1 fixture's last lat rational in place
    val t = Exif.encodeTiff(littleEndian = true, orientation = 1,
      make = "c", model = "m", gps = Some(Exif.GpsDms('N', 40, 26, 0, 'E', 0, 0, 0)))
    // lat rationals are the first 24 bytes of the rational block: find
    // them by parsing offsets is overkill — scan for the 40/1 pattern
    val le = java.nio.ByteBuffer.wrap(t).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var at = -1
    var i = 0
    while (at < 0 && i + 24 <= t.length) {
      if (le.getInt(i) == 40 && le.getInt(i + 4) == 1 &&
        le.getInt(i + 8) == 26 && le.getInt(i + 12) == 1) at = i
      i += 1
    }
    assert(at > 0, "lat rational block not found")
    le.putInt(at + 16, 4572); le.putInt(at + 20, 100)
    val e = Exif.parseTiff(t, 0, t.length)
    // 40deg + 26min + 4572/100 s = 144_000_000 + 1_560_000 + 45_720
    assert(e.gpsLatMas == 144000000L + 1560000L + 45720L)
  }

  test("JPEG carrier: found by the marker walk, gone after strip") {
    val tiff = Exif.encodeTiff(littleEndian = true, orientation = 3,
      make = "CamCo", model = "M1", gps = Some(gps))
    val base = JpegCodec.encodeJpegDcOnly(16, 10, (_, _) => 128)
    val withExif = base.take(2) ++ Exif.encodeJpegApp1(tiff) ++ base.drop(2)
    val found = Exif.fromJpeg(withExif)
    assert(found.exists(e => e.orientation == 3 && e.hasGps))
    assert(Exif.fromImage(withExif)._1 == "jpeg")
    // decode still works on the carrier (APP1 skipped by the decoder)
    val (w, h, _) = JpegCodec.decode(withExif)
    assert((w, h) == ((16, 10)))
    // scrub composes: strip removes the APP1, detection then reports none
    val (stripped, n) = JpegCodec.stripMetadata(withExif)
    assert(n == 1)
    assert(Exif.fromJpeg(stripped).isEmpty)
    // and a plain fixture JPEG reports none to begin with
    assert(Exif.fromJpeg(base).isEmpty)
  }

  test("JPEG carrier: 0xff fill bytes before markers are skipped") {
    val tiff = Exif.encodeTiff(littleEndian = true, orientation = 3,
      make = "CamCo", model = "M1", gps = Some(gps))
    val base = JpegCodec.encodeJpegDcOnly(16, 10, (_, _) => 128)
    // pad three JPEG-legal fill bytes between SOI and the APP1 marker
    val fill = Array.fill(3)(0xff.toByte)
    val padded = base.take(2) ++ fill ++ Exif.encodeJpegApp1(tiff) ++
      base.drop(2)
    val found = Exif.fromJpeg(padded)
    assert(found.exists(e => e.orientation == 3 && e.hasGps),
      "fill bytes before APP1 must not break detection")
    // detect and scrub agree: stripMetadata walks the same stream
    val (stripped, n) = JpegCodec.stripMetadata(padded)
    assert(n == 1)
    assert(Exif.fromJpeg(stripped).isEmpty)
    // a file that ends in fill bytes (after EOI trail) reports none
    assert(Exif.fromJpeg(base ++ fill).isEmpty)
  }

  test("PNG carrier: eXIf chunk CRC-validated, gone after strip") {
    val tiff = Exif.encodeTiff(littleEndian = false, orientation = 8,
      make = "K", model = "Z9", gps = None)
    val base = Multimodal.ImageHeader.encodePngStored(20, 12,
      (x, y) => (x * 7 + y * 13) % 251)
    val withExif = base.take(33) ++ Exif.encodePngExifChunk(tiff) ++ base.drop(33)
    val found = Exif.fromPng(withExif)
    assert(found.exists(e => !e.littleEndian && e.orientation == 8 &&
      e.model == "Z9" && !e.hasGps))
    assert(Exif.fromImage(withExif)._1 == "png")
    // the pixel decoder skips the ancillary chunk
    val (w, h, _) = Multimodal.PngCodec.decode(withExif)
    assert((w, h) == ((20, 12)))
    val (stripped, n) = Multimodal.PngCodec.stripMetadata(withExif)
    assert(n == 1)
    assert(Exif.fromPng(stripped).isEmpty)
    // corrupt the chunk CRC -> named reject
    val bad = withExif.clone()
    bad(33 + 8 + tiff.length) = (bad(33 + 8 + tiff.length) ^ 0xff).toByte
    val ex = intercept[IllegalArgumentException](Exif.fromPng(bad))
    assert(ex.getMessage.contains("CRC"))
  }

  test("parseTiff survives byte corruption with only named rejects") {
    // every single-byte overwrite either parses to SOME ExifInfo or
    // throws the contract's IllegalArgumentException — never an
    // ArrayIndexOutOfBounds or other raw JVM error (the MP4 fuzz
    // precedent, applied to the round's new parser)
    val base = Exif.encodeTiff(littleEndian = true, orientation = 6,
      make = "CamCo", model = "Model-X", gps = Some(gps))
    var rejected = 0
    for (pos <- base.indices; v <- Seq(0x00, 0x7f, 0xff)) {
      val t = base.clone()
      t(pos) = v.toByte
      try { Exif.parseTiff(t, 0, t.length); () }
      catch { case _: IllegalArgumentException => rejected += 1 }
    }
    assert(rejected > 0, "corruption never tripped a named reject")
    // truncation at every length: same contract
    for (len <- 0 until base.length) {
      try { Exif.parseTiff(base, 0, len); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("fromImage is total over the still-image family") {
    val gif = Multimodal.ImageHeader.encodeGif(8, 8, (x, y) => (x + y) % 251)
    assert(Exif.fromImage(gif) == (("gif", None)))
    val bmp = Multimodal.ImageHeader.encodeBmp(8, 8, (x, y) => (x + y) % 251)
    assert(Exif.fromImage(bmp) == (("bmp", None)))
    val junk = intercept[IllegalArgumentException](
      Exif.fromImage(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9)))
    assert(junk.getMessage.contains("still image"))
  }

  test("hostile structures reject loudly by name") {
    def parsePatched(patch: Array[Byte] => Unit): Exif.ExifInfo = {
      val t = Exif.encodeTiff(littleEndian = true, orientation = 1,
        make = "CamCo", model = "M", gps = Some(gps))
      patch(t)
      Exif.parseTiff(t, 0, t.length)
    }
    // bad byte-order mark
    val bom = intercept[IllegalArgumentException](parsePatched(t => t(0) = 'X'))
    assert(bom.getMessage.contains("byte-order"))
    // wrong magic
    val mg = intercept[IllegalArgumentException](parsePatched(t => t(2) = 43))
    assert(mg.getMessage.contains("magic"))
    // IFD0 offset past the end
    val off = intercept[IllegalArgumentException](parsePatched { t =>
      t(4) = 0xff.toByte; t(5) = 0xff.toByte
    })
    assert(off.getMessage.contains("IFD0 offset"))
    // truncated: header claims more than the slice holds
    val tr = intercept[IllegalArgumentException] {
      val t = Exif.encodeTiff(littleEndian = true, orientation = 1,
        make = "CamCo", model = "M", gps = Some(gps))
      Exif.parseTiff(t, 0, 20) // IFD0 fits only partially
    }
    assert(tr.getMessage.contains("overrun") || tr.getMessage.contains("out of bounds"))
    // zero-denominator rational
    val zd = intercept[IllegalArgumentException] {
      val t = Exif.encodeTiff(littleEndian = true, orientation = 1,
        make = "c", model = "m", gps = Some(gps))
      val le = java.nio.ByteBuffer.wrap(t).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i + 8 <= t.length) {
        if (le.getInt(i) == 40 && le.getInt(i + 4) == 1) le.putInt(i + 4, 0)
        i += 1
      }
      Exif.parseTiff(t, 0, t.length)
    }
    assert(zd.getMessage.contains("denominator"))
    // oversized rational (exact-arithmetic contract)
    val ov = intercept[IllegalArgumentException] {
      val t = Exif.encodeTiff(littleEndian = true, orientation = 1,
        make = "c", model = "m", gps = Some(gps))
      val le = java.nio.ByteBuffer.wrap(t).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var i = 0
      while (i + 8 <= t.length) {
        if (le.getInt(i) == 40 && le.getInt(i + 4) == 1) le.putInt(i, 2000000)
        i += 1
      }
      Exif.parseTiff(t, 0, t.length)
    }
    assert(ov.getMessage.contains("10^4"))
    // truncated APP1: Exif prefix present but segment shorter than a header
    val shortApp1 = Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xe1.toByte, 0, 10, 'E', 'x', 'i', 'f', 0, 0, 0x49, 0x49) ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    val ta = intercept[IllegalArgumentException](Exif.fromJpeg(shortApp1))
    assert(ta.getMessage.contains("8 bytes"))
  }
}
