package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._

/** REAL EXIF metadata parse — the detection side of the privacy-scrub
  * story (X185/X187/X189 REMOVE metadata blind; this op tells a
  * curation pipeline WHICH media carry GPS fixes, camera identity, or
  * orientation before it decides to scrub, drop, or quarantine).
  * Reference scope note: the reference (cynthiacai56/lasdb) has no
  * media metadata handling at all — beyond-reference surface, built
  * from the public TIFF 6.0 / EXIF 2.3 / PNG-eXIf (2017 extension)
  * specifications only.
  *
  * The payload is a genuine TIFF structure: byte-order mark (`II`
  * little-endian / `MM` big-endian — BOTH parsed), magic 42, IFD0 as
  * 12-byte tag entries with inline-or-offset values, the GPS sub-IFD
  * behind the 0x8825 LONG pointer, ASCII / SHORT / LONG / RATIONAL
  * value types. Carriers: JPEG APP1 (`Exif\0\0` prefix) found by the
  * same marker walk [[JpegCodec.stripMetadata]] uses, and the PNG
  * `eXIf` chunk (raw TIFF, CRC-validated). Every untrusted offset and
  * length is bounds-checked; structural violations reject loudly by
  * name with the failing offset (the house contract).
  *
  * Exactness: GPS coordinates are exposed in signed MILLI-ARC-SECONDS
  * via the floor-divided rational composition
  * `floor((dN·3600000·mD·sD + mN·60000·dD·sD + sN·1000·dD·mD) /
  * (dD·mD·sD))` — all-integer, so the registered query's oracle can
  * replay it arithmetically. Rational components above 10^4 reject
  * (the worst-case composition then stays < 3.7·10^18, inside 64-bit
  * — real EXIF writers emit degrees <= 360 over denominators
  * 1..10000; a fuzzer does not, and gets a named reject instead of a
  * silent overflow).
  */
object Exif {

  /** Parsed flags; `orientation` 0 / empty strings / 0 mas = absent. */
  final case class ExifInfo(
      littleEndian: Boolean,
      orientation: Int,
      make: String,
      model: String,
      hasGps: Boolean,
      gpsLatMas: Long,
      gpsLonMas: Long)

  private def fail(off: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"EXIF: $msg (offset $off)")

  private final val TagMake = 0x010f
  private final val TagModel = 0x0110
  private final val TagOrientation = 0x0112
  private final val TagGpsIfd = 0x8825
  private final val TagGpsLatRef = 0x0001
  private final val TagGpsLat = 0x0002
  private final val TagGpsLonRef = 0x0003
  private final val TagGpsLon = 0x0004

  /** Parse the TIFF structure in `b[start, end)`. */
  def parseTiff(b: Array[Byte], start: Int, end: Int): ExifInfo = {
    if (end > b.length || start < 0 || end - start < 8)
      fail(start, s"TIFF header needs 8 bytes, have ${end - start}")
    val le = ((b(start) & 0xff), (b(start + 1) & 0xff)) match {
      case (0x49, 0x49) => true
      case (0x4d, 0x4d) => false
      case (a, c) => fail(start, f"bad byte-order mark 0x$a%02x$c%02x")
    }
    def u16(i: Int): Int = {
      if (i < start || i + 2 > end) fail(i, "u16 out of bounds")
      val a = b(i) & 0xff; val c = b(i + 1) & 0xff
      if (le) a | (c << 8) else (a << 8) | c
    }
    def u32(i: Int): Long = {
      if (i < start || i + 4 > end) fail(i, "u32 out of bounds")
      val x0 = (b(i) & 0xff).toLong; val x1 = (b(i + 1) & 0xff).toLong
      val x2 = (b(i + 2) & 0xff).toLong; val x3 = (b(i + 3) & 0xff).toLong
      if (le) x0 | (x1 << 8) | (x2 << 16) | (x3 << 24)
      else (x0 << 24) | (x1 << 16) | (x2 << 8) | x3
    }
    if (u16(start + 2) != 42) fail(start + 2, s"TIFF magic ${u16(start + 2)} != 42")

    /** Resolve an entry's value position: inline when it fits 4 bytes. */
    def valuePos(entryAt: Int, byteSize: Long): Int =
      if (byteSize <= 4) entryAt + 8
      else {
        val off = u32(entryAt + 8)
        if (off > Int.MaxValue || start + off + byteSize > end)
          fail(entryAt + 8, s"value offset $off overruns TIFF of ${end - start} bytes")
        start + off.toInt
      }

    def ascii(entryAt: Int, count: Long): String = {
      if (count > 4096) fail(entryAt, s"ASCII value of $count bytes out of contract")
      val at = valuePos(entryAt, count)
      val sb = new StringBuilder
      var i = 0
      while (i < count && (b(at + i) & 0xff) != 0) {
        sb.append((b(at + i) & 0xff).toChar); i += 1
      }
      sb.toString
    }

    def rational(at: Int): (Long, Long) = {
      val n = u32(at); val d = u32(at + 4)
      if (d == 0) fail(at + 4, "RATIONAL with zero denominator")
      if (n > 10000L || d > 10000L)
        fail(at, s"RATIONAL $n/$d out of the <=10^4 exact-arithmetic contract")
      (n, d)
    }

    /** Degrees/minutes/seconds rationals -> signed milli-arc-seconds. */
    def dmsToMas(at: Int, negative: Boolean): Long = {
      val (dN, dD) = rational(at)
      val (mN, mD) = rational(at + 8)
      val (sN, sD) = rational(at + 16)
      val num = dN * 3600000L * mD * sD + mN * 60000L * dD * sD + sN * 1000L * dD * mD
      val mas = Math.floorDiv(num, dD * mD * sD)
      if (negative) -mas else mas
    }

    /** Walk one IFD, calling back per entry; returns nothing of its own. */
    def walkIfd(at: Int)(onEntry: (Int, Int, Int, Long, Int) => Unit): Unit = {
      val n = u16(at)
      if (n > 512) fail(at, s"IFD entry count $n out of contract")
      if (at + 2 + 12 * n + 4 > end) fail(at, s"IFD of $n entries overruns")
      var i = 0
      while (i < n) {
        val e = at + 2 + 12 * i
        onEntry(e, u16(e), u16(e + 2), u32(e + 4), i)
        i += 1
      }
    }

    val ifd0Off = u32(start + 4)
    if (ifd0Off > Int.MaxValue || start + ifd0Off + 2 > end)
      fail(start + 4, s"IFD0 offset $ifd0Off overruns TIFF of ${end - start} bytes")

    var orientation = 0
    var make = ""; var model = ""
    var gpsAt = -1
    walkIfd(start + ifd0Off.toInt) { (e, tag, typ, count, _) =>
      tag match {
        case TagMake if typ == 2 => make = ascii(e, count)
        case TagModel if typ == 2 => model = ascii(e, count)
        case TagOrientation if typ == 3 => orientation = u16(valuePos(e, 2 * count))
        case TagGpsIfd if typ == 4 =>
          val off = u32(e + 8)
          if (off > Int.MaxValue || start + off + 2 > end)
            fail(e + 8, s"GPS IFD offset $off overruns")
          gpsAt = start + off.toInt
        case _ => () // unknown tags skip — inline values need no bounds work
      }
    }

    var latMas = 0L; var lonMas = 0L
    var latRef = ""; var lonRef = ""
    var latAt = -1; var lonAt = -1
    if (gpsAt >= 0) {
      walkIfd(gpsAt) { (e, tag, typ, count, _) =>
        tag match {
          case TagGpsLatRef if typ == 2 => latRef = ascii(e, count)
          case TagGpsLonRef if typ == 2 => lonRef = ascii(e, count)
          case TagGpsLat if typ == 5 && count == 3 => latAt = valuePos(e, 24)
          case TagGpsLon if typ == 5 && count == 3 => lonAt = valuePos(e, 24)
          case _ => ()
        }
      }
      if (latAt >= 0) latMas = dmsToMas(latAt, latRef == "S")
      if (lonAt >= 0) lonMas = dmsToMas(lonAt, lonRef == "W")
    }
    ExifInfo(le, orientation, make, model, gpsAt >= 0, latMas, lonMas)
  }

  /** Find the EXIF APP1 in a JPEG (marker walk up to SOS). */
  def fromJpeg(b: Array[Byte]): Option[ExifInfo] = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      fail(0, "bad SOI")
    var p = 2
    while (p + 4 <= b.length) {
      if ((b(p) & 0xff) != 0xff) fail(p, f"expected marker, got 0x${b(p) & 0xff}%02x")
      // JPEG-legal 0xff fill bytes may pad before a marker — skip them
      // (same walk as JpegCodec.stripMetadata, so detect and scrub agree
      // on which files parse)
      while (p + 1 < b.length && (b(p + 1) & 0xff) == 0xff) p += 1
      if (p + 4 > b.length) return None
      val m = b(p + 1) & 0xff
      if (m == 0xd9 || m == 0xda) return None // EOI / scan: no EXIF ahead
      if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { p += 2 }
      else {
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length)
          fail(p + 2, s"segment length $len overruns ${b.length} bytes")
        if (m == 0xe1 && len >= 8 &&
            b(p + 4) == 'E' && b(p + 5) == 'x' && b(p + 6) == 'i' &&
            b(p + 7) == 'f' && b(p + 8) == 0 && b(p + 9) == 0)
          return Some(parseTiff(b, p + 10, p + 2 + len))
        p += 2 + len
      }
    }
    None
  }

  private val pngSig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

  /** Find the eXIf chunk in a PNG (chunk walk, CRC-validated). */
  def fromPng(b: Array[Byte]): Option[ExifInfo] = {
    if (b.length < 8 || (0 until 8).exists(i => (b(i) & 0xff) != pngSig(i)))
      fail(0, "bad PNG signature")
    var p = 8
    while (p + 12 <= b.length) {
      val len = ((b(p) & 0xff).toLong << 24) | ((b(p + 1) & 0xff) << 16) |
        ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      if (p + 12 + len > b.length) fail(p, s"chunk length $len overruns")
      val tag = new String(b, p + 4, 4, "US-ASCII")
      if (tag == "eXIf") {
        val crc = new java.util.zip.CRC32
        crc.update(b, p + 4, 4 + len.toInt)
        val stored = ((b(p + 8 + len.toInt) & 0xff).toLong << 24) |
          ((b(p + 9 + len.toInt) & 0xff) << 16) |
          ((b(p + 10 + len.toInt) & 0xff) << 8) | (b(p + 11 + len.toInt) & 0xff)
        if (crc.getValue != stored) fail(p + 8 + len.toInt, "eXIf chunk CRC mismatch")
        return Some(parseTiff(b, p + 8, p + 8 + len.toInt))
      }
      if (tag == "IEND") return None
      p += 12 + len.toInt
    }
    None
  }

  /** Sniff the container by signature and dispatch — total over the
    * still-image family: "jpeg" | "png" (the EXIF carriers, walked),
    * "gif" | "bmp" (those containers define no EXIF slot — GIF
    * metadata lives in extension blocks, BMP has none — so detection
    * returns None without a walk; [[Multimodal.GifCodec.stripMetadata]]
    * is the GIF-side scrub). Returns (container, exif). */
  def fromImage(b: Array[Byte]): (String, Option[ExifInfo]) =
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      ("jpeg", fromJpeg(b))
    else if (b.length >= 8 && (0 until 8).forall(i => (b(i) & 0xff) == pngSig(i)))
      ("png", fromPng(b))
    else if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      ("gif", None)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M')
      ("bmp", None)
    else fail(0, "not a JPEG/PNG/GIF/BMP still image")

  // ---- fixture encoders (real TIFF structure, deterministic) ----

  /** Degrees/minutes/seconds with den=1 rationals — the fixture shape. */
  final case class GpsDms(latRef: Char, latD: Int, latM: Int, latS: Int,
      lonRef: Char, lonD: Int, lonM: Int, lonS: Int)

  /** Encode a real TIFF carrying Make/Model/Orientation and optionally
    * a GPS sub-IFD, in either byte order. */
  def encodeTiff(littleEndian: Boolean, orientation: Int,
      make: String, model: String, gps: Option[GpsDms]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    def w8(v: Int): Unit = out.write(v & 0xff)
    def w16(v: Int): Unit =
      if (littleEndian) { w8(v); w8(v >> 8) } else { w8(v >> 8); w8(v) }
    def w32(v: Long): Unit =
      if (littleEndian) { w8(v.toInt); w8((v >> 8).toInt); w8((v >> 16).toInt); w8((v >> 24).toInt) }
      else { w8((v >> 24).toInt); w8((v >> 16).toInt); w8((v >> 8).toInt); w8(v.toInt) }

    val makeB = (make + "\u0000").getBytes("US-ASCII")
    val modelB = (model + "\u0000").getBytes("US-ASCII")
    val n0 = 3 + (if (gps.isDefined) 1 else 0)
    val ifd0Size = 2 + 12 * n0 + 4
    var data = 8 + ifd0Size // running offset of the deferred-data area
    val makeOff = data; if (makeB.length > 4) data += makeB.length
    val modelOff = data; if (modelB.length > 4) data += modelB.length
    val gpsIfdOff = data

    // header
    w16(if (littleEndian) 0x4949 else 0x4d4d)
    w16(42); w32(8)
    // IFD0
    w16(n0)
    def asciiEntry(tag: Int, bytes: Array[Byte], off: Int): Unit = {
      w16(tag); w16(2); w32(bytes.length)
      if (bytes.length <= 4) {
        var i = 0
        while (i < 4) { w8(if (i < bytes.length) bytes(i) else 0); i += 1 }
      } else w32(off)
    }
    asciiEntry(TagMake, makeB, makeOff)
    asciiEntry(TagModel, modelB, modelOff)
    w16(TagOrientation); w16(3); w32(1)
    // inline SHORT packs at the START of the value field in file order
    w16(orientation); w16(0)
    if (gps.isDefined) { w16(TagGpsIfd); w16(4); w32(1); w32(gpsIfdOff) }
    w32(0) // no IFD1
    // deferred data
    if (makeB.length > 4) out.write(makeB)
    if (modelB.length > 4) out.write(modelB)
    gps.foreach { g =>
      val nG = 4
      val gSize = 2 + 12 * nG + 4
      val latRatOff = gpsIfdOff + gSize
      val lonRatOff = latRatOff + 24
      w16(nG)
      def refEntry(tag: Int, ref: Char): Unit = {
        w16(tag); w16(2); w32(2); w8(ref); w8(0); w8(0); w8(0)
      }
      refEntry(TagGpsLatRef, g.latRef)
      w16(TagGpsLat); w16(5); w32(3); w32(latRatOff)
      refEntry(TagGpsLonRef, g.lonRef)
      w16(TagGpsLon); w16(5); w32(3); w32(lonRatOff)
      w32(0)
      for (v <- Seq(g.latD, g.latM, g.latS, g.lonD, g.lonM, g.lonS)) {
        w32(v); w32(1)
      }
    }
    out.toByteArray
  }

  /** The full JPEG APP1 segment (marker + length + Exif\0\0 + TIFF). */
  def encodeJpegApp1(tiff: Array[Byte]): Array[Byte] = {
    val len = 2 + 6 + tiff.length
    if (len > 0xffff) fail(0, s"APP1 of $len bytes exceeds the 64 KiB segment limit")
    val a = new Array[Byte](2 + len)
    a(0) = 0xff.toByte; a(1) = 0xe1.toByte
    a(2) = ((len >> 8) & 0xff).toByte; a(3) = (len & 0xff).toByte
    a(4) = 'E'; a(5) = 'x'; a(6) = 'i'; a(7) = 'f'; a(8) = 0; a(9) = 0
    tiff.copyToArray(a, 10)
    a
  }

  /** The PNG eXIf chunk (length + tag + TIFF + CRC). */
  def encodePngExifChunk(tiff: Array[Byte]): Array[Byte] = {
    val n = tiff.length
    val a = new Array[Byte](12 + n)
    a(0) = (n >> 24).toByte; a(1) = (n >> 16).toByte
    a(2) = (n >> 8).toByte; a(3) = n.toByte
    a(4) = 'e'; a(5) = 'X'; a(6) = 'I'; a(7) = 'f'
    tiff.copyToArray(a, 8)
    val crc = new java.util.zip.CRC32
    crc.update(a, 4, 4 + n)
    val c = crc.getValue
    a(8 + n) = (c >> 24).toByte; a(9 + n) = (c >> 16).toByte
    a(10 + n) = (c >> 8).toByte; a(11 + n) = c.toByte
    a
  }

  /** Per-image EXIF privacy flags over a media table — one narrow
    * mapPartitions (decode is a header/marker walk, pixels are never
    * touched), only flag rows shuffle; at 100 TB the payload bytes
    * stay on their executor. Output: (media_id, container, byte_order,
    * has_exif, orientation, make, model, has_gps, gps_lat_mas,
    * gps_lon_mas). */
  def exifFlags(media: DataFrame): DataFrame = {
    val enc = Encoders.product[
      (Long, String, String, Boolean, Int, String, String, Boolean, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val (container, info) = fromImage(r.getAs[Array[Byte]](1))
          info match {
            case Some(e) =>
              (id, container, if (e.littleEndian) "II" else "MM", true,
                e.orientation, e.make, e.model, e.hasGps, e.gpsLatMas, e.gpsLonMas)
            case None =>
              (id, container, "", false, 0, "", "", false, 0L, 0L)
          }
        }
      }(enc).toDF("media_id", "container", "byte_order", "has_exif",
        "orientation", "make", "model", "has_gps", "gps_lat_mas", "gps_lon_mas")
  }
}
