package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image / audio / video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; decode / feature-extract / resize / frame-sample run as
  * partition-batched transforms.
  *
  * The Spark-side plumbing here is real and tested — schema contracts,
  * partition batching, metadata propagation, deterministic outputs.
  * Real codec paths (pure JVM, public formats): PNG/JPEG container
  * dimension parse ([[ImageHeader]]) and full WAV PCM decode
  * ([[WavCodec]] + [[wavSegmentStats]]). COMPRESSED audio/video
  * (MP3/AAC/H.26x) remain STUBS — this environment ships no codec
  * libraries — behind [[FakeCodec]], which derives deterministic
  * pseudo-metadata from the bytes; swapping in a real codec changes
  * only the body of the `decode*` functions, never a signature,
  * schema, or batch shape.
  *
  * Batching note: transforms use mapPartitions over a typed Dataset —
  * one JVM-side loop per partition, no per-row UDF setup cost; the
  * Python-side equivalent would be mapInPandas with arrow batches.
  */
object Multimodal {

  /** The canonical media row: id + kind + raw payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true)))

  final case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, sample_rate: Int)

  final case class MediaFeature(
      media_id: Long, n_bytes: Long, checksum: Long, feature: Array[Float])

  /** STUB codec: deterministic pseudo-decode derived only from the
    * payload bytes — stands in for libjpeg/ffmpeg/soundfile. Replace the
    * bodies (not the shapes) to go real. */
  object FakeCodec {
    def imageDims(bytes: Array[Byte]): (Int, Int) = {
      val n = bytes.length.toLong
      (64 + (n % 512).toInt, 64 + (n * 31 % 512).toInt)
    }
    def frameCount(bytes: Array[Byte]): Int = 1 + bytes.length % 30
    def sampleRate(kind: String): Int = kind match {
      case "audio" => 16000
      case "video" => 30
      case _ => 0
    }
    /** Pseudo-pixel plane: every stride-th byte, sign-extended. */
    def samplePlane(bytes: Array[Byte], stride: Int, maxLen: Int): Array[Float] = {
      val out = new Array[Float](math.min(maxLen, (bytes.length + stride - 1) / stride))
      var i = 0
      while (i < out.length) { out(i) = bytes(i * stride).toFloat; i += 1 }
      out
    }
    def checksum(bytes: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
      h
    }
  }

  /** Real image-container header decode — pure JVM, no codec library.
    * Reads dimensions from the first bytes of the payload (PNG IHDR;
    * JPEG SOF marker scan), which is also the 100 TB-correct shape: a
    * metadata pass must touch O(100) bytes per item, never run a full
    * pixel decode. Returns None for payloads that are not PNG/JPEG
    * (callers fall back to [[FakeCodec]] for the stubbed kinds). */
  object ImageHeader {
    private def be32(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
        ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

    private val pngSig =
      Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)

    /** (width, height) if the payload is a PNG, JPEG, GIF, or BMP
      * container. GIF dims come from the logical screen descriptor;
      * BMP from BITMAPINFOHEADER (or any of its larger successors —
      * the header-size field gates the layout), with the height
      * absolute-valued (negative = top-down row order, same pixel
      * grid). */
    def dims(bytes: Array[Byte]): Option[(Int, Int)] =
      if (bytes.length >= 24 && bytes.take(8).sameElements(pngSig) &&
          bytes(12) == 'I' && bytes(13) == 'H' && bytes(14) == 'D' && bytes(15) == 'R')
        Some((be32(bytes, 16), be32(bytes, 20)))
      else if (bytes.length >= 4 && (bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
        jpegDims(bytes)
      else if (bytes.length >= 10 && bytes(0) == 'G' && bytes(1) == 'I' &&
          bytes(2) == 'F' && bytes(3) == '8' &&
          (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
        Some((le16(bytes, 6), le16(bytes, 8)))
      else if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M' &&
          le32(bytes, 14) >= 40) {
        // width must be positive; height may be negative (top-down row
        // order) but never zero — anything else is a hostile payload
        // wearing a 'BM' prefix, not a bitmap
        val w = le32(bytes, 18); val h = math.abs(le32(bytes, 22))
        if (w > 0 && h > 0) Some((w, h)) else None
      } else None

    /** Walk JPEG marker segments to the first SOFn (baseline/progressive
      * frame header: FF Cn len prec height width). */
    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 2
      while (i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) return None // desynced — not a marker
        // fill bytes: consecutive FFs pad before a marker
        var j = i + 1
        while (j < b.length && (b(j) & 0xff) == 0xff) j += 1
        if (j >= b.length) return None
        val m = b(j) & 0xff
        if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
          // SOFn: len(2) precision(1) height(2) width(2)
          if (j + 8 < b.length) return Some((be16(b, j + 6), be16(b, j + 4)))
          return None
        } else if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
          i = j + 1 // standalone marker, no length field
        } else if (m == 0xd9 || m == 0xda) {
          return None // EOI / start-of-scan before any frame header
        } else {
          if (j + 2 >= b.length) return None
          i = j + 1 + be16(b, j + 1) // skip the length-prefixed segment
        }
      }
      None
    }

    /** Encode a REAL grayscale 8-bit PNG with zlib STORED blocks
      * (hand-rolled wrapper, no Deflater) — a valid PNG any reader
      * opens, whose total byte length is exactly 68 + h*(w+1) for
      * h*(w+1) <= 65535, so oracles can predict every field of the
      * metadata row by arithmetic. Fixture-side helper; the engine
      * direction is [[dims]]. */
    def encodePngStored(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0 && h * (w + 1) <= 65535, s"stored-block fixture cap: ${h * (w + 1)}")
      val raw = new Array[Byte](h * (w + 1)) // filter byte 0 + scanline
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raw(y * (w + 1) + 1 + x) = pix(x, y).toByte; x += 1 }
        y += 1
      }
      pngGrayFromRaw(w, h, interlaced = false, raw)
    }

    /** The Adam7 variant of [[encodePngStored]]: the same grayscale
      * stored-zlib filter-0 fixture with the scanlines emitted in the
      * seven-pass interlace order (IHDR interlace = 1) — so pixel
      * queries exercise the decoder's pass-scatter path with the SAME
      * pixel-formula oracle as the progressive images a crawl
      * actually carries. */
    def encodePngStoredInterlaced(w: Int, h: Int,
        pix: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0, s"degenerate ${w}x$h")
      val passes = (0 until 7).map { k =>
        val (x0, y0, dx, dy) = (Array(0, 4, 0, 2, 0, 1, 0)(k),
          Array(0, 0, 4, 0, 2, 0, 1)(k), Array(8, 8, 4, 4, 2, 2, 1)(k),
          Array(8, 8, 8, 4, 4, 2, 2)(k))
        (x0, y0, dx, dy, (w - x0 + dx - 1) / dx, (h - y0 + dy - 1) / dy)
      }.filter(t => t._5 > 0 && t._6 > 0)
      val total = passes.map { case (_, _, _, _, pw, ph) => (pw + 1) * ph }.sum
      require(total <= 65535, s"stored-block fixture cap: $total")
      val raw = new Array[Byte](total)
      var o = 0
      passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
        var py = 0
        while (py < ph) {
          o += 1 // filter byte 0
          var px = 0
          while (px < pw) {
            raw(o) = pix(x0 + dx * px, y0 + dy * py).toByte
            o += 1; px += 1
          }
          py += 1
        }
      }
      pngGrayFromRaw(w, h, interlaced = true, raw)
    }

    private def pngGrayFromRaw(w: Int, h: Int, interlaced: Boolean,
        raw: Array[Byte]): Array[Byte] = {
      val adler = { val a = new java.util.zip.Adler32; a.update(raw); a.getValue }
      val idat = java.nio.ByteBuffer.allocate(11 + raw.length)
      idat.put(0x78.toByte).put(0x01.toByte) // zlib header, no preset dict
      idat.put(0x01.toByte) // BFINAL=1, BTYPE=00 (stored)
      idat.put((raw.length & 0xff).toByte).put(((raw.length >> 8) & 0xff).toByte)
      idat.put(((~raw.length) & 0xff).toByte).put((((~raw.length) >> 8) & 0xff).toByte)
      idat.put(raw)
      idat.putInt(adler.toInt)
      def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
        val out = java.nio.ByteBuffer.allocate(12 + data.length)
        out.putInt(data.length).put(tag.getBytes("US-ASCII")).put(data)
        val crc = new java.util.zip.CRC32
        crc.update(tag.getBytes("US-ASCII")); crc.update(data)
        out.putInt(crc.getValue.toInt)
        out.array()
      }
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h)
        .put(8.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
        .put(if (interlaced) 1.toByte else 0.toByte)
      pngSig ++ chunk("IHDR", ihdr.array()) ++ chunk("IDAT", idat.array()) ++
        chunk("IEND", Array.emptyByteArray)
    }

    /** Encode a REAL baseline JPEG via the JDK's bundled writer
      * (javax.imageio, pure JVM). Byte length is codec-dependent, so
      * fixtures built from this only assert parsed dimensions. */
    def encodeJpeg(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val v = pix(x, y) & 0xff
          img.setRGB(x, y, (v << 16) | (v << 8) | v); x += 1
        }
        y += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }

    /** Encode a REAL single-frame 8-bit grayscale GIF89a (256-entry
      * global gray palette) using the classic "uncompressed GIF" LZW
      * emission: every pixel as its literal 9-bit code with a CLEAR
      * every 250 pixels, so the decoder's dictionary never forces the
      * code width past 9 bits — a valid GIF any reader opens (the
      * spec cross-checks pixels through the JDK decoder). Fixture-side
      * helper; the engine direction is [[dims]]. */
    /** The all-literal LZW image data encodeGif and
      * encodeGifAnimated share: min-code byte + 9-bit literal codes
      * with a CLEAR every 250 literals (keeps the next free code
      * below 512, so 9-bit codes stay valid throughout) + EOI, packed
      * into length-prefixed sub-blocks with terminator. */
    private def writeGifImageData(out: java.io.ByteArrayOutputStream,
        fw: Int, fh: Int, pix: (Int, Int) => Int): Unit = {
      out.write(8) // LZW minimum code size
      val codes = new java.io.ByteArrayOutputStream()
      var acc = 0L
      var nbits = 0
      def emit(code: Int): Unit = {
        acc |= code.toLong << nbits; nbits += 9
        while (nbits >= 8) {
          codes.write((acc & 0xff).toInt); acc >>= 8; nbits -= 8
        }
      }
      val clear = 256
      emit(clear)
      var sinceClear = 0
      var y = 0
      while (y < fh) {
        var x = 0
        while (x < fw) {
          emit(pix(x, y) & 0xff)
          sinceClear += 1
          if (sinceClear == 250) { emit(clear); sinceClear = 0 }
          x += 1
        }
        y += 1
      }
      emit(257) // end-of-information
      if (nbits > 0) codes.write((acc & 0xff).toInt)
      val cb = codes.toByteArray
      var o = 0
      while (o < cb.length) { // length-prefixed sub-blocks
        val n = math.min(255, cb.length - o)
        out.write(n); out.write(cb, o, n); o += n
      }
      out.write(0) // block terminator
    }

    def encodeGif(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0 && w <= 0xffff && h <= 0xffff,
        s"gif dims out of u16 range: $w x $h")
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("GIF89a".getBytes("US-ASCII"))
      le16(w); le16(h)
      out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
      out.write(0); out.write(0) // background index, aspect ratio
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
      out.write(0x2c) // image descriptor
      le16(0); le16(0); le16(w); le16(h)
      out.write(0) // no local table, not interlaced
      writeGifImageData(out, w, h, pix)
      out.write(0x3b) // trailer
      out.toByteArray
    }

    /** Animated fixture encoder: per frame a Graphic Control
      * Extension (delay in centiseconds) + an image descriptor placed
      * at (left, top) sharing the gray GCT, all-literal LZW data. */
    def encodeGifAnimated(w: Int, h: Int,
        frames: Seq[(Int, Int, Int, Int, (Int, Int) => Int)],
        delaysCs: Seq[Int]): Array[Byte] = {
      require(frames.nonEmpty && frames.length == delaysCs.length)
      val out = new java.io.ByteArrayOutputStream()
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      out.write("GIF89a".getBytes("US-ASCII"))
      le16(w); le16(h)
      out.write(0xf7); out.write(0); out.write(0)
      var i = 0
      while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
      frames.zip(delaysCs).foreach { case ((left, top, fw, fh, pix), delay) =>
        require(left >= 0 && top >= 0 && left + fw <= w && top + fh <= h,
          s"frame ${fw}x$fh@($left,$top) outside the ${w}x$h screen")
        out.write(0x21); out.write(0xf9); out.write(4) // GCE
        out.write(0) // no disposal, no transparency
        le16(delay)
        out.write(0) // transparent index (unused)
        out.write(0) // GCE terminator
        out.write(0x2c)
        le16(left); le16(top); le16(fw); le16(fh)
        out.write(0) // GCT, not interlaced
        writeGifImageData(out, fw, fh, pix)
      }
      out.write(0x3b)
      out.toByteArray
    }

    /** Encode a REAL 24-bit uncompressed bottom-up BMP
      * (BITMAPINFOHEADER, rows padded to 4 bytes) — valid everywhere,
      * byte length exactly 54 + h * rowBytes. Fixture-side helper;
      * the engine direction is [[dims]]. */
    def encodeBmp(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      require(w > 0 && h > 0, s"bmp dims must be positive: $w x $h")
      val rowBytes = (w * 3 + 3) & ~3
      val size = 54 + rowBytes * h
      val b = new Array[Byte](size)
      def putLe16(i: Int, v: Int): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
      }
      def putLe32(i: Int, v: Int): Unit = {
        b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
        b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
      }
      b(0) = 'B'; b(1) = 'M'
      putLe32(2, size); putLe32(10, 54)
      putLe32(14, 40); putLe32(18, w); putLe32(22, h)
      putLe16(26, 1); putLe16(28, 24) // planes, bits per pixel
      putLe32(34, rowBytes * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val g = pix(x, y) & 0xff
          val off = 54 + (h - 1 - y) * rowBytes + x * 3
          b(off) = g.toByte; b(off + 1) = g.toByte; b(off + 2) = g.toByte
          x += 1
        }
        y += 1
      }
      b
    }

    /** [[encodeBmp]]'s full-COLOR twin: pix returns 0xRRGGBB, stored
      * as the BMP's little-endian BGR triplets — the second real
      * color carrier (with [[PngCodec.encodeRgb]]) for fixtures that
      * need channels to differ. */
    def encodeBmpRgb(w: Int, h: Int, pix: (Int, Int) => Int): Array[Byte] = {
      val gray = encodeBmp(w, h, (_, _) => 0) // header via the gray twin
      val rowBytes = (w * 3 + 3) & ~3
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = pix(x, y)
          val off = 54 + (h - 1 - y) * rowBytes + x * 3
          gray(off) = (p & 0xff).toByte            // B
          gray(off + 1) = ((p >> 8) & 0xff).toByte // G
          gray(off + 2) = ((p >> 16) & 0xff).toByte // R
          x += 1
        }
        y += 1
      }
      gray
    }
  }

  /** REAL GIF pixel decode — the full variable-code-width LZW
    * decompressor (GIF89a appendix F), not just the literal-code
    * subset [[ImageHeader.encodeGif]] emits: dictionary growth to 12
    * bits, CLEAR resets, the KwKwK self-reference case, interlaced
    * row reordering, local color tables. This moves the documented
    * multimodal boundary: image PIXELS are now real for the lossless
    * LZW path (like FLAC did for audio samples), leaving only LOSSY
    * sample codecs (JPEG/MP3/H.264) as stubs. Spec cross-checks
    * against the JDK ImageIO GIF ENCODER's genuinely-compressed
    * streams, adversarial inputs rejected loudly with offsets.
    *
    * Scope (checked, loud): the FIRST image frame, which must cover
    * the full logical screen at (0,0) — the single-frame still-image
    * contract; animation compositing is out of scope. Every untrusted
    * length is bounds-checked; output must tile exactly w*h pixels. */
  object GifCodec {

    /** Strip metadata extension blocks — Comment (0xFE), Application
      * (0xFF: XMP, NETSCAPE loops, ...) and Plain Text (0x01) — from a
      * GIF as a pure block walk, completing the still-image scrub trio
      * with [[JpegCodec.stripMetadata]] and [[PngCodec.stripMetadata]].
      * Graphic Control extensions (0xF9) stay: they alter rendering
      * (transparency), not metadata. Image descriptors, color tables,
      * and LZW data copy verbatim; idempotent; structural errors
      * reject loudly with offsets. Returns (bytes, blocksRemoved). */
    def stripMetadata(b: Array[Byte]): (Array[Byte], Int) = {
      def fail(off: Int, msg: String): Nothing =
        throw new IllegalArgumentException(s"GIF: $msg (offset $off)")
      def u8(i: Int): Int = {
        if (i < 0 || i >= b.length) fail(i, "truncated")
        b(i) & 0xff
      }
      if (b.length < 13) fail(0, "shorter than header")
      val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
      if (sig != "GIF89a" && sig != "GIF87a") fail(0, s"bad signature '$sig'")
      val out = new java.io.ByteArrayOutputStream(b.length)
      var removed = 0
      var p = 13
      if ((u8(10) & 0x80) != 0) p += 3 * (1 << ((u8(10) & 7) + 1))
      out.write(b, 0, p) // header + LSD + global color table
      var done = false
      while (!done) {
        u8(p) match {
          case 0x21 =>
            val label = u8(p + 1)
            var q = p + 2
            while (u8(q) != 0) {
              val n = u8(q)
              if (q + 1 + n > b.length) fail(q, "truncated sub-block")
              q += 1 + n
            }
            q += 1
            if (label == 0xfe || label == 0xff || label == 0x01) removed += 1
            else out.write(b, p, q - p)
            p = q
          case 0x2c =>
            // image descriptor + optional local table + LZW sub-blocks
            val start = p
            val ifl = u8(p + 9)
            var q = p + 10
            if ((ifl & 0x80) != 0) q += 3 * (1 << ((ifl & 7) + 1))
            q += 1 // LZW min code size
            while (u8(q) != 0) {
              val n = u8(q)
              if (q + 1 + n > b.length) fail(q, "truncated sub-block")
              q += 1 + n
            }
            q += 1
            out.write(b, start, q - start)
            p = q
          case 0x3b =>
            out.write(0x3b)
            done = true
            if (p + 1 != b.length) fail(p + 1,
              s"${b.length - p - 1} trailing bytes after trailer")
          case other => fail(p, f"unknown block 0x$other%02x")
        }
      }
      (out.toByteArray, removed)
    }

    /** (width, height, packed 0xRRGGBB pixels, row-major). */
    def decode(b: Array[Byte]): (Int, Int, Array[Int]) = {
      def fail(off: Int, msg: String): Nothing =
        throw new IllegalArgumentException(s"GIF: $msg (offset $off)")
      def u8(i: Int): Int = {
        if (i < 0 || i >= b.length) fail(i, "truncated")
        b(i) & 0xff
      }
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      if (b.length < 13) fail(0, "shorter than header")
      val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
      if (sig != "GIF89a" && sig != "GIF87a") fail(0, s"bad signature '$sig'")
      val w = u16(6); val h = u16(8)
      if (w <= 0 || h <= 0) fail(6, s"degenerate dims ${w}x$h")
      val flags = u8(10)
      var p = 13
      var gct: Array[Int] = null
      if ((flags & 0x80) != 0) {
        val n = 1 << ((flags & 7) + 1)
        gct = readPalette(b, p, n, fail); p += 3 * n
      }
      while (true) {
        u8(p) match {
          case 0x21 => // extension: label + length-prefixed sub-blocks
            p += 2
            while (u8(p) != 0) p += 1 + u8(p)
            p += 1
          case 0x3b => fail(p, "trailer before any image frame")
          case 0x2c =>
            val (left, top, iw, ih) = (u16(p + 1), u16(p + 3),
              u16(p + 5), u16(p + 7))
            if (left != 0 || top != 0 || iw != w || ih != h)
              fail(p, s"frame ${iw}x$ih@($left,$top) does not cover the " +
                s"${w}x$h screen — single-frame contract")
            val ifl = u8(p + 9)
            var q = p + 10
            var pal = gct
            if ((ifl & 0x80) != 0) {
              val n = 1 << ((ifl & 7) + 1)
              pal = readPalette(b, q, n, fail); q += 3 * n
            }
            if (pal == null) fail(p, "no color table in scope")
            val minCode = u8(q); q += 1
            if (minCode < 2 || minCode > 8) fail(q - 1, s"LZW min code $minCode")
            // concatenate the length-prefixed data sub-blocks
            val data = new java.io.ByteArrayOutputStream()
            while (u8(q) != 0) {
              val n = u8(q)
              if (q + 1 + n > b.length) fail(q, "truncated sub-block")
              data.write(b, q + 1, n); q += 1 + n
            }
            val idx = lzw(data.toByteArray, minCode, iw * ih, fail)
            val ordered =
              if ((ifl & 0x40) != 0) deinterlace(idx, iw, ih) else idx
            val out = new Array[Int](iw * ih)
            var i = 0
            while (i < out.length) {
              val ci = ordered(i) & 0xff
              if (ci >= pal.length) fail(p, s"palette index $ci of ${pal.length}")
              out(i) = pal(ci)
              i += 1
            }
            return (w, h, out)
          case other => fail(p, f"unknown block 0x$other%02x")
        }
      }
      fail(0, "unreachable")
    }

    final case class GifFrame(index: Int, left: Int, top: Int,
        w: Int, h: Int, delayCs: Int, px: Array[Int])

    /** Decode EVERY frame of a (possibly animated) GIF — the frame
      * SAMPLING primitive for the crawl's video-lite format: each
      * image descriptor decodes independently through the full LZW
      * machinery with its own palette and interlace flag, placement
      * (left, top — frames may be sub-rectangles) and the preceding
      * Graphic Control delay surfaced per frame. Disposal/compositing
      * is display semantics this contract deliberately does not
      * define (documented boundary — sampling wants the raw frames,
      * not a screen simulation). Returns (screenW, screenH, frames);
      * a GIF with no image descriptor rejects loudly, as do frames
      * outside the screen and every untrusted length. */
    def decodeFrames(b: Array[Byte]): (Int, Int, List[GifFrame]) = {
      def fail(off: Int, msg: String): Nothing =
        throw new IllegalArgumentException(s"GIF: $msg (offset $off)")
      def u8(i: Int): Int = {
        if (i < 0 || i >= b.length) fail(i, "truncated")
        b(i) & 0xff
      }
      def u16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
      if (b.length < 13) fail(0, "shorter than header")
      val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
      if (sig != "GIF89a" && sig != "GIF87a") fail(0, s"bad signature '$sig'")
      val w = u16(6); val h = u16(8)
      if (w <= 0 || h <= 0) fail(6, s"degenerate dims ${w}x$h")
      val flags = u8(10)
      var p = 13
      var gct: Array[Int] = null
      if ((flags & 0x80) != 0) {
        val n = 1 << ((flags & 7) + 1)
        gct = readPalette(b, p, n, fail); p += 3 * n
      }
      var frames = List.empty[GifFrame]
      var idx = 0
      var pendingDelay = 0
      while (true) {
        u8(p) match {
          case 0x21 =>
            val label = u8(p + 1)
            if (label == 0xf9) { // Graphic Control: capture the delay
              if (u8(p + 2) != 4) fail(p + 2, s"GCE block size ${u8(p + 2)} != 4")
              pendingDelay = u16(p + 4)
            }
            p += 2
            while (u8(p) != 0) p += 1 + u8(p)
            p += 1
          case 0x3b =>
            if (frames.isEmpty) fail(p, "trailer before any image frame")
            return (w, h, frames.reverse)
          case 0x2c =>
            val (left, top, iw, ih) = (u16(p + 1), u16(p + 3),
              u16(p + 5), u16(p + 7))
            if (iw <= 0 || ih <= 0 || left + iw > w || top + ih > h)
              fail(p, s"frame ${iw}x$ih@($left,$top) outside the ${w}x$h screen")
            val ifl = u8(p + 9)
            var q = p + 10
            var pal = gct
            if ((ifl & 0x80) != 0) {
              val n = 1 << ((ifl & 7) + 1)
              pal = readPalette(b, q, n, fail); q += 3 * n
            }
            if (pal == null) fail(p, "no color table in scope")
            val minCode = u8(q); q += 1
            if (minCode < 2 || minCode > 8) fail(q - 1, s"LZW min code $minCode")
            val data = new java.io.ByteArrayOutputStream()
            while (u8(q) != 0) {
              val n = u8(q)
              if (q + 1 + n > b.length) fail(q, "truncated sub-block")
              data.write(b, q + 1, n); q += 1 + n
            }
            q += 1 // past the terminator
            val raw = lzw(data.toByteArray, minCode, iw * ih, fail)
            val ordered =
              if ((ifl & 0x40) != 0) deinterlace(raw, iw, ih) else raw
            val out = new Array[Int](iw * ih)
            var i = 0
            while (i < out.length) {
              val ci = ordered(i) & 0xff
              if (ci >= pal.length) fail(p, s"palette index $ci of ${pal.length}")
              out(i) = pal(ci)
              i += 1
            }
            frames = GifFrame(idx, left, top, iw, ih, pendingDelay, out) :: frames
            idx += 1
            pendingDelay = 0
            p = q
          case other => fail(p, f"unknown block 0x$other%02x")
        }
      }
      fail(0, "unreachable")
    }

    private def readPalette(b: Array[Byte], at: Int, n: Int,
        fail: (Int, String) => Nothing): Array[Int] = {
      if (at + 3 * n > b.length) fail(at, "truncated color table")
      Array.tabulate(n) { i =>
        ((b(at + 3 * i) & 0xff) << 16) | ((b(at + 3 * i + 1) & 0xff) << 8) |
          (b(at + 3 * i + 2) & 0xff)
      }
    }

    /** GIF-flavor LZW: emits EXACTLY `expect` indices then the EOI
      * code; anything else is a loud reject. */
    private def lzw(d: Array[Byte], minCode: Int, expect: Int,
        fail: (Int, String) => Nothing): Array[Byte] = {
      val clear = 1 << minCode
      val eoi = clear + 1
      val prefix = new Array[Int](4096)
      val suffix = new Array[Byte](4096)
      val out = new Array[Byte](expect)
      var outN = 0
      var next = eoi + 1
      var width = minCode + 1
      var prev = -1
      var acc = 0L; var nbits = 0; var pos = 0
      val stack = new Array[Byte](4096)
      def emitSeq(code: Int): Int = { // returns the first byte
        var c = code; var sp = 0
        while (c >= clear) { // walk the chain (codes < clear are roots)
          stack(sp) = suffix(c); sp += 1; c = prefix(c)
        }
        val first = c
        if (outN + sp + 1 > expect) fail(pos, "LZW output overrun")
        out(outN) = c.toByte; outN += 1
        while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
        first
      }
      while (true) {
        while (nbits < width) {
          if (pos >= d.length) fail(pos, "LZW stream ended before EOI")
          acc |= (d(pos) & 0xffL) << nbits; nbits += 8; pos += 1
        }
        val code = (acc & ((1 << width) - 1)).toInt
        acc >>= width; nbits -= width
        if (code == clear) {
          next = eoi + 1; width = minCode + 1; prev = -1
        } else if (code == eoi) {
          if (outN != expect) fail(pos, s"EOI after $outN of $expect pixels")
          return out
        } else if (prev == -1) {
          if (code >= clear) fail(pos, s"first code $code not a literal")
          if (outN >= expect) fail(pos, "LZW output overrun")
          out(outN) = code.toByte; outN += 1
          prev = code
        } else {
          if (code > next || (code == next && next >= 4096))
            fail(pos, s"LZW code $code beyond dictionary $next")
          val first =
            if (code == next) { // KwKwK: sequence = prev + first(prev)
              val f = emitSeq(prev)
              if (outN >= expect) fail(pos, "LZW output overrun")
              out(outN) = f.toByte; outN += 1
              f
            } else emitSeq(code)
          if (next < 4096) {
            prefix(next) = prev; suffix(next) = first.toByte; next += 1
            if (next < 4096 && next == (1 << width)) width += 1
          }
          prev = code
        }
      }
      fail(0, "unreachable")
    }

    /** GIF interlace passes: rows 0,8,16.. then 4,12.. then 2,6..
      * then 1,3,5.. back into display order. */
    private def deinterlace(idx: Array[Byte], w: Int, h: Int): Array[Byte] = {
      val out = new Array[Byte](idx.length)
      var src = 0
      for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
        var y = start
        while (y < h) {
          System.arraycopy(idx, src * w, out, y * w, w)
          src += 1; y += step
        }
      }
      out
    }
  }

  /** REAL PNG pixel decode — zlib inflate (JDK Inflater, the WARC
    * member path's primitive) plus the full scanline un-filtering
    * chain (None/Sub/Up/Average/Paeth, RFC 2083 §6), chunk CRCs
    * validated, every untrusted length checked. Bit depth 8, color
    * types 0 (gray), 2 (RGB), 3 (palette + PLTE), 6 (RGBA, alpha
    * dropped for the packed-RGB return); BOTH interlace methods —
    * null and Adam7 (seven independently-filtered sub-images scattered
    * back by the pass geometry; spec cross-checks the JDK encoder's
    * progressive mode). With [[GifCodec]] this puts both still-image
    * container formats the corpus carries on the real-pixels side of
    * the multimodal boundary. */
  object PngCodec {
    private val sig = Array[Int](0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)

    /** Chunk types that survive [[stripMetadata]]: the critical four
      * plus tRNS (it changes pixels). Everything else — tEXt/zTXt/
      * iTXt, eXIf (PNG carries EXIF since the 2017 extension), tIME,
      * pHYs, gAMA/cHRM/iCCP/sRGB, private chunks — is metadata a
      * privacy scrub drops. */
    private val keepChunks = Set("IHDR", "PLTE", "IDAT", "IEND", "tRNS")

    /** Strip ancillary metadata chunks from a PNG without touching
      * pixel data — [[JpegCodec.stripMetadata]]'s parity for the other
      * still-image container. Kept chunks copy VERBATIM (their CRCs
      * stay valid without recomputation); idempotent; structural
      * errors (bad signature, overrunning lengths, missing IEND)
      * reject loudly with offsets. CRCs of dropped chunks are not
      * validated — the scrub never inspects their content. Returns
      * (strippedBytes, chunksRemoved). */
    def stripMetadata(b: Array[Byte]): (Array[Byte], Int) = {
      def fail(off: Int, msg: String): Nothing =
        throw new IllegalArgumentException(s"PNG: $msg (offset $off)")
      if (b.length < 8 || (0 until 8).exists(i => (b(i) & 0xff) != sig(i)))
        fail(0, "bad signature")
      val out = new java.io.ByteArrayOutputStream(b.length)
      out.write(b, 0, 8)
      var removed = 0
      var p = 8
      var done = false
      while (!done) {
        if (p + 12 > b.length) fail(p, "truncated chunk header")
        val len = (((b(p) & 0xffL) << 24) | ((b(p + 1) & 0xffL) << 16) |
          ((b(p + 2) & 0xffL) << 8) | (b(p + 3) & 0xffL))
        if (len > Int.MaxValue - 12 || p + 12 + len > b.length)
          fail(p, s"chunk length $len overruns ${b.length} bytes")
        val tag = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val total = 12 + len.toInt
        if (keepChunks(tag)) out.write(b, p, total) else removed += 1
        if (tag == "IEND") done = true
        p += total
      }
      if (p != b.length) fail(p, s"${b.length - p} trailing bytes after IEND")
      (out.toByteArray, removed)
    }

    /** REAL PNG encoder — the write side of the container-normalize
      * step (decode ANY supported format, re-encode as one canonical
      * lossless container). Color type 2 (8-bit RGB), no interlace,
      * filter 0 on every row, zlib STORED blocks — stored framing is
      * hand-rolled so the output is deterministic byte-for-byte on
      * every JVM (Deflater's block segmentation is not spec-pinned
      * even at NO_COMPRESSION), which is what makes the transcode
      * query's LENGTH an exact oracle: with raw = h·(3w+1) and
      * nb = ceil(raw/65535) stored blocks, the file is exactly
      * 63 + raw + 5·nb bytes (8 signature + 25 IHDR + 12 IDAT frame
      * + 2 zlib header + 5·nb block headers + raw + 4 Adler + 12
      * IEND). CRCs and Adler-32 are real, so any conforming reader
      * (the JDK's included — spec-pinned) accepts the output. */
    def encodeRgb(w: Int, h: Int, px: Array[Int]): Array[Byte] = {
      require(w > 0 && h > 0, s"encodeRgb: bad dims ${w}x$h")
      require(px.length == w * h,
        s"encodeRgb: ${px.length} pixels for ${w}x$h = ${w * h}")
      val raw = new Array[Byte](h * (3 * w + 1))
      var o = 0; var y = 0
      while (y < h) {
        raw(o) = 0 // filter type None
        o += 1
        var x = 0
        while (x < w) {
          val p = px(y * w + x)
          raw(o) = ((p >> 16) & 0xff).toByte
          raw(o + 1) = ((p >> 8) & 0xff).toByte
          raw(o + 2) = (p & 0xff).toByte
          o += 3; x += 1
        }
        y += 1
      }
      val zl = new java.io.ByteArrayOutputStream(raw.length + 64)
      zl.write(0x78); zl.write(0x01)
      var off = 0
      var lastEmitted = false
      while (!lastEmitted) {
        val n = math.min(65535, raw.length - off)
        lastEmitted = off + n == raw.length
        zl.write(if (lastEmitted) 1 else 0)
        zl.write(n & 0xff); zl.write((n >> 8) & 0xff)
        zl.write(~n & 0xff); zl.write((~n >> 8) & 0xff)
        zl.write(raw, off, n)
        off += n
      }
      val ad = new java.util.zip.Adler32
      ad.update(raw)
      val a = ad.getValue
      zl.write(((a >> 24) & 0xff).toInt); zl.write(((a >> 16) & 0xff).toInt)
      zl.write(((a >> 8) & 0xff).toInt); zl.write((a & 0xff).toInt)
      def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
        val out = new Array[Byte](12 + data.length)
        val n = data.length
        out(0) = (n >> 24).toByte; out(1) = (n >> 16).toByte
        out(2) = (n >> 8).toByte; out(3) = n.toByte
        tag.getBytes("US-ASCII").copyToArray(out, 4)
        data.copyToArray(out, 8)
        val crc = new java.util.zip.CRC32
        crc.update(out, 4, 4 + n)
        val c = crc.getValue
        out(8 + n) = (c >> 24).toByte; out(9 + n) = (c >> 16).toByte
        out(10 + n) = (c >> 8).toByte; out(11 + n) = c.toByte
        out
      }
      val ihdr = Array[Byte](
        (w >> 24).toByte, (w >> 16).toByte, (w >> 8).toByte, w.toByte,
        (h >> 24).toByte, (h >> 16).toByte, (h >> 8).toByte, h.toByte,
        8, 2, 0, 0, 0)
      sig.map(_.toByte) ++ chunk("IHDR", ihdr) ++
        chunk("IDAT", zl.toByteArray) ++ chunk("IEND", Array.emptyByteArray)
    }

    /** (width, height, packed 0xRRGGBB pixels, row-major). */
    def decode(b: Array[Byte]): (Int, Int, Array[Int]) = {
      def fail(off: Int, msg: String): Nothing =
        throw new IllegalArgumentException(s"PNG: $msg (offset $off)")
      if (b.length < 8 || (0 until 8).exists(i => (b(i) & 0xff) != sig(i)))
        fail(0, "bad signature")
      def u32(i: Int): Long = {
        if (i + 4 > b.length) fail(i, "truncated")
        ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
          ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
      }
      var p = 8
      var w = 0; var h = 0; var colorType = -1; var interlaced = false
      var plte: Array[Int] = null
      val idat = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        val len = u32(p)
        if (len > Int.MaxValue - 12 || p + 12 + len > b.length)
          fail(p, s"chunk length $len overruns ${b.length} bytes")
        val n = len.toInt
        val tag = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val crc = new java.util.zip.CRC32
        crc.update(b, p + 4, 4 + n)
        if (crc.getValue != u32(p + 8 + n))
          fail(p, s"$tag chunk CRC mismatch")
        val d = p + 8
        tag match {
          case "IHDR" =>
            if (n != 13) fail(p, s"IHDR length $n")
            w = u32(d).toInt; h = u32(d + 4).toInt
            if (w <= 0 || h <= 0) fail(d, s"degenerate dims ${w}x$h")
            val (depth, ct, comp, filt, il) =
              (b(d + 8) & 0xff, b(d + 9) & 0xff, b(d + 10) & 0xff,
                b(d + 11) & 0xff, b(d + 12) & 0xff)
            if (depth != 8) fail(d + 8, s"bit depth $depth (contract: 8)")
            if (comp != 0 || filt != 0) fail(d + 10, "nonstandard method")
            if (il != 0 && il != 1) fail(d + 12, s"interlace method $il")
            interlaced = il == 1
            if (ct != 0 && ct != 2 && ct != 3 && ct != 6)
              fail(d + 9, s"color type $ct")
            colorType = ct
          case "PLTE" =>
            if (n % 3 != 0 || n > 768) fail(p, s"PLTE length $n")
            plte = Array.tabulate(n / 3)(i =>
              ((b(d + 3 * i) & 0xff) << 16) | ((b(d + 3 * i + 1) & 0xff) << 8) |
                (b(d + 3 * i + 2) & 0xff))
          case "IDAT" => idat.write(b, d, n)
          case "IEND" => done = true
          case _ => () // ancillary chunks skipped (CRC still checked)
        }
        p += 12 + n
      }
      if (colorType < 0) fail(0, "no IHDR")
      if (idat.size() == 0) fail(0, "no IDAT")
      val bpp = colorType match {
        case 0 => 1; case 2 => 3; case 3 => 1; case 6 => 4
      }
      // pass list: the whole image as one pass, or the seven Adam7
      // sub-images (x0, y0, dx, dy, passW, passH) — empty passes
      // (dimension rounds to 0) contribute NO scanlines, per spec
      val passes: Seq[(Int, Int, Int, Int, Int, Int)] =
        if (!interlaced) Seq((0, 0, 1, 1, w, h))
        else (0 until 7).map { k =>
          val (x0, y0, dx, dy) =
            (adamX0(k), adamY0(k), adamDx(k), adamDy(k))
          ((x0, y0, dx, dy,
            (w - x0 + dx - 1) / dx, (h - y0 + dy - 1) / dy))
        }.filter(t => t._5 > 0 && t._6 > 0)
      val rawLen = passes.map { case (_, _, _, _, pw, ph) =>
        (pw * bpp + 1) * ph }.sum
      val raw = new Array[Byte](rawLen)
      val inf = new java.util.zip.Inflater()
      inf.setInput(idat.toByteArray)
      var got = 0
      try {
        while (got < raw.length && !inf.finished()) {
          val k = inf.inflate(raw, got, raw.length - got)
          if (k == 0 && inf.needsInput()) fail(0, "IDAT ended early")
          got += k
        }
      } catch {
        case e: java.util.zip.DataFormatException =>
          fail(0, s"corrupt deflate stream: ${e.getMessage}")
      }
      if (got != raw.length) fail(0, s"inflated $got of ${raw.length}")
      // un-filter one pass's scanlines in place (rows are
      // (stride+1)-byte filter-prefixed; `up` is the previous row OF
      // THE SAME PASS — Adam7 passes filter independently, per spec)
      def unfilterAt(base: Int, stride: Int, rows: Int): Unit = {
        var y = 0
        while (y < rows) {
          val ro = base + y * (stride + 1)
          val ft = raw(ro) & 0xff
          def cur(i: Int): Int = raw(ro + 1 + i) & 0xff
          def left(i: Int): Int = if (i >= bpp) cur(i - bpp) else 0
          def up(i: Int): Int =
            if (y > 0) raw(ro - stride - 1 + 1 + i) & 0xff else 0
          def upLeft(i: Int): Int =
            if (y > 0 && i >= bpp) raw(ro - stride - 1 + 1 + i - bpp) & 0xff
            else 0
          var i = 0
          while (i < stride) {
            val x = cur(i)
            val v = ft match {
              case 0 => x
              case 1 => x + left(i)
              case 2 => x + up(i)
              case 3 => x + (left(i) + up(i)) / 2
              case 4 =>
                val (a, bb, c) = (left(i), up(i), upLeft(i))
                val pp = a + bb - c
                val (pa, pb, pc) =
                  (math.abs(pp - a), math.abs(pp - bb), math.abs(pp - c))
                x + (if (pa <= pb && pa <= pc) a else if (pb <= pc) bb else c)
              case other => fail(ro, s"filter type $other")
            }
            raw(ro + 1 + i) = (v & 0xff).toByte
            i += 1
          }
          y += 1
        }
      }
      // packed 0xRRGGBB of the pixel whose first sample byte is `o`
      def pixAt(o: Int): Int = colorType match {
        case 0 =>
          val g = raw(o) & 0xff; (g << 16) | (g << 8) | g
        case 2 =>
          ((raw(o) & 0xff) << 16) | ((raw(o + 1) & 0xff) << 8) |
            (raw(o + 2) & 0xff)
        case 3 =>
          if (plte == null) fail(0, "palette image without PLTE")
          val ci = raw(o) & 0xff
          if (ci >= plte.length) fail(0, s"palette index $ci of ${plte.length}")
          plte(ci)
        case 6 =>
          ((raw(o) & 0xff) << 16) | ((raw(o + 1) & 0xff) << 8) |
            (raw(o + 2) & 0xff)
      }
      val out = new Array[Int](w * h)
      var base = 0
      passes.foreach { case (x0, y0, dx, dy, pw, ph) =>
        val stride = pw * bpp
        unfilterAt(base, stride, ph)
        var py = 0
        while (py < ph) {
          val ro = base + py * (stride + 1) + 1
          var px = 0
          while (px < pw) {
            out((y0 + dy * py) * w + (x0 + dx * px)) = pixAt(ro + bpp * px)
            px += 1
          }
          py += 1
        }
        base += (stride + 1) * ph
      }
      (w, h, out)
    }

    // Adam7 pass origins and strides (RFC 2083 §2.6 figure): pass k
    // samples pixels (x0 + i·dx, y0 + j·dy)
    private val adamX0 = Array(0, 4, 0, 2, 0, 1, 0)
    private val adamY0 = Array(0, 0, 4, 0, 2, 0, 1)
    private val adamDx = Array(8, 8, 4, 4, 2, 2, 1)
    private val adamDy = Array(8, 8, 8, 4, 4, 2, 2)
  }

  /** Integer box-mean DOWNSAMPLE of a decoded pixel array — the
    * thumbnail kernel every multimodal training pipeline runs before
    * feature extraction, and the generalization of the dHash 9x8
    * grid: target cell (i,j) averages exactly the source pixels with
    * i = x·tw/w, j = y·th/h (floor), per CHANNEL, mean = floor(sum /
    * count). All-integer, so it replays exactly in any engine.
    * Upsampling (tw > w or th > h) would leave empty cells and needs
    * interpolation semantics this contract does not define — rejects
    * loudly. tw = w and th = h is the identity. */
  def resizePixels(px: Array[Int], w: Int, h: Int,
      tw: Int, th: Int): Array[Int] = {
    require(tw > 0 && th > 0, s"resize target must be positive: $tw x $th")
    require(tw <= w && th <= h,
      s"resize: upsampling ${w}x$h -> ${tw}x$th out of contract (box-mean is downsample-only)")
    val n = tw * th
    val rs = new Array[Long](n); val gs = new Array[Long](n)
    val bs = new Array[Long](n); val cn = new Array[Long](n)
    var y = 0
    while (y < h) {
      val j = y * th / h
      var x = 0
      while (x < w) {
        val k = j * tw + x * tw / w
        val p = px(y * w + x)
        rs(k) += (p >> 16) & 0xff; gs(k) += (p >> 8) & 0xff
        bs(k) += p & 0xff; cn(k) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(n) { k =>
      (((rs(k) / cn(k)).toInt) << 16) | (((gs(k) / cn(k)).toInt) << 8) |
        (bs(k) / cn(k)).toInt
    }
  }

  /** Thumbnail the corpus: decode each image (signature-sniffed real
    * codecs), box-mean resize to outW x outH, and emit an EXACTLY
    * replayable frame — a position-weighted checksum over the
    * resized low channel (sum of (j·outW+i+1)·mean, which pins every
    * cell's VALUE AND PLACE, not just the multiset) plus the cell
    * min/max. Decode + resize are one narrow map; only the stat rows
    * shuffle — at 100 TB the thumbnails' pixels never leave their
    * executor. */
  def imageResizeStats(media: DataFrame, outW: Int, outH: Int): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          val t = resizePixels(px, w, h, outW, outH)
          var ck = 0L; var mn = 255L; var mx = 0L
          var k = 0
          while (k < t.length) {
            val v = (t(k) & 0xff).toLong
            ck += (k + 1) * v; if (v < mn) mn = v; if (v > mx) mx = v
            k += 1
          }
          (id, w.toLong, h.toLong, outW.toLong, outH.toLong, ck, mn, mx)
        }
      }(enc).toDF("media_id", "width", "height", "out_w", "out_h",
        "checksum", "min_cell", "max_cell")
  }

  /** Container NORMALIZATION: decode each image through its real
    * signature-sniffed codec and re-encode as canonical 8-bit-RGB
    * stored-block PNG ([[PngCodec.encodeRgb]]) — the "one container
    * downstream" step a multimodal ingest runs so later stages parse
    * exactly one format. The emitted stats come from RE-DECODING the
    * transcoded bytes (not the source), so a row is only right if the
    * full decode -> encode -> decode chain preserved every pixel; the
    * deterministic stored framing additionally makes `out_len` exact
    * arithmetic (63 + raw + 5·ceil(raw/65535), raw = h·(3w+1)).
    * Decode + re-encode + re-decode run as one narrow map — bytes
    * never shuffle. */
  def imageTranscodeStats(media: DataFrame): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          val png = PngCodec.encodeRgb(w, h, px)
          val (dw, dh, qx) = PngCodec.decode(png)
          if (dw != w || dh != h)
            throw new IllegalStateException(
              s"transcode changed dims: ${w}x$h -> ${dw}x$dh (media $id)")
          var sum = 0L; var mn = 255L; var mx = 0L
          var i = 0
          while (i < qx.length) {
            val v = (qx(i) & 0xff).toLong
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          (id, w.toLong, h.toLong, png.length.toLong, sum, mn, mx)
        }
      }(enc).toDF("media_id", "width", "height", "out_len",
        "sum_gray", "min_gray", "max_gray")
  }

  /** Boundary-aware HTML attribute extract: the attribute name must
    * follow a non-name boundary character — whitespace OR a closing
    * quote (browsers tolerate `alt="x"src="y"` with no separator), so
    * lazy-load `data-src=` still never shadows `src=` (the `-` before
    * `src` is not a boundary) while quote-adjacent attributes are
    * found. The value may be double-quoted, single-quoted, or
    * unquoted; an EMPTY quoted value (`src=""`) extracts as `""` —
    * presence is tested with `rlike` on the same pattern rather than
    * non-emptiness of the extract, so empty values resolve to the
    * matching branch instead of falling through (ADVICE r15).
    * Codegen'd `regexp_extract`/`rlike` folded with `when` — no UDF. */
  private def htmlAttr(tag: Column, name: String): Column = {
    val pDq = "[\\s\"']" + name + "\\s*=\\s*\"([^\"]*)\""
    val pSq = "[\\s\"']" + name + "\\s*=\\s*'([^']*)'"
    val pUq = "[\\s\"']" + name + "\\s*=\\s*([^\\s>\"'][^\\s>]*)"
    when(tag.rlike(pDq), regexp_extract(tag, pDq, 1))
      .otherwise(when(tag.rlike(pSq), regexp_extract(tag, pSq, 1))
        .otherwise(regexp_extract(tag, pUq, 1)))
  }

  /** VLM pair mining: join (img-src, alt-text) pairs extracted from
    * HTML pages with the crawl's decoded images by CANONICAL url —
    * the image-text pair construction a vision-language training set
    * starts from. Page side: every `<img>` tag explodes via built-in
    * `regexp_extract_all`, then boundary-aware per-tag src/alt
    * extracts ([[htmlAttr]]: `data-src=` never shadows `src=`;
    * single-quoted and unquoted values supported; all codegen'd;
    * tags missing either attribute drop). Image side:
    * whatever per-image frame the caller built (real decode upstream).
    * Both sides key on [[CorpusMix.canonicalUrl]] (X153's chain), so
    * a src carrying tracking params still finds its image. Only the
    * pair rows and canonical keys shuffle — page HTML and pixels
    * never do. */
  def imageAltPairs(pages: DataFrame, pageIdCol: String, htmlCol: String,
      images: DataFrame, imageUrlCol: String): DataFrame = {
    val pairs = pages.select(col(pageIdCol).as("page_id"),
        explode(expr(s"regexp_extract_all($htmlCol, '<img[^>]*>', 0)")).as("__tag"))
      .select(col("page_id"),
        htmlAttr(col("__tag"), "src").as("__src"),
        htmlAttr(col("__tag"), "alt").as("alt"))
      .filter(col("__src") =!= "" && col("alt") =!= "")
      .withColumn("__curl", CorpusMix.canonicalUrl(col("__src")))
      .drop("__src")
    pairs.join(
        images.withColumn("__curl", CorpusMix.canonicalUrl(col(imageUrlCol))),
        "__curl")
      .drop("__curl", imageUrlCol)
  }

  /** Per-image pixel statistics through the REAL decoders — payloads
    * are sniffed by signature (GIF -> [[GifCodec]], PNG ->
    * [[PngCodec]]; anything else rejects loudly); gray value = the
    * low (blue) channel of the decoded pixel (identical across
    * channels for gray images). One decode per row inside
    * mapPartitions, stats folded in place — nothing but the stat rows
    * ever shuffles. */
  def imagePixelStats(media: DataFrame): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          var sum = 0L; var mn = 255L; var mx = 0L
          var i = 0
          while (i < px.length) {
            val v = (px(i) & 0xff).toLong
            sum += v; if (v < mn) mn = v; if (v > mx) mx = v
            i += 1
          }
          (id, w.toLong, h.toLong, px.length.toLong, sum, mn, mx)
        }
      }(enc).toDF("media_id", "width", "height", "n_pixels",
        "sum_gray", "min_gray", "max_gray")
  }

  /** Perceptual difference-hash (dHash) over REAL decoded pixels —
    * the image analogue of SimHash for near-dup detection, and the
    * cross-FORMAT dedup primitive: the hash is a function of pixel
    * CONTENT only, so the same image stored as GIF, PNG, and (DC-only
    * exact) JPEG buckets together. All-integer pipeline, replayable
    * in any engine:
    *
    *   1. integer luma per pixel: (77·R + 150·G + 29·B) >> 8
    *      (identity on gray pixels);
    *   2. box-mean over a 9x8 grid, cell(i,j) = pixels with
    *      i = x·9/w, j = y·8/h (floor), mean = floor(sum/count) —
    *      this is the resize step, so near-dups that differ by a few
    *      pixels (or a re-encode) still collide;
    *   3. 64 gradient bits: bit (j·8+i) set iff cell(i,j) < cell(i+1,j)
    *      — comparing ADJACENT cells makes the hash invariant to any
    *      monotone global brightness shift (spec-pinned), unlike aHash;
    *   4. rendered as a 16-hex-char string (sign-free on every engine).
    *
    * Grouping by the hash then gives exact-perceptual-dup clusters;
    * banding its four 16-bit quarters gives the Hamming-near-dup
    * candidate join (the SimHash X4 recipe, reused). Output:
    * (media_id, width, height, dhash, n_same_hash). At 100 TB the
    * shuffle carries 16-byte hashes — never pixels; the decode is a
    * narrow per-row map. */
  def imageDHash(media: DataFrame): DataFrame =
    dHashRows(media).withColumn("n_same_hash",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("dhash"))).cast("long"))

  /** The pure dHash kernel over decoded pixels — 16 hex chars; shared
    * by [[dHashRows]] and by composed pipelines that compute the hash
    * inline in an existing per-row map (saves them a second decode
    * pass). */
  def dHashOf(w: Int, h: Int, px: Array[Int]): String = {
    val sums = new Array[Long](72)
    val cnts = new Array[Long](72)
    var y = 0
    while (y < h) {
      val j = y * 8 / h
      var x = 0
      while (x < w) {
        val i = x * 9 / w
        val p = px(y * w + x)
        val luma = (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
          29 * (p & 0xff)) >> 8
        sums(j * 9 + i) += luma; cnts(j * 9 + i) += 1
        x += 1
      }
      y += 1
    }
    val cell = Array.tabulate(72)(k =>
      if (cnts(k) == 0) 0L else sums(k) / cnts(k))
    var bits = 0L
    var j = 0
    while (j < 8) {
      var i = 0
      while (i < 8) {
        if (cell(j * 9 + i) < cell(j * 9 + i + 1))
          bits |= 1L << (j * 8 + i)
        i += 1
      }
      j += 1
    }
    f"$bits%016x"
  }

  /** The windowless hash frame (media_id, width, height, dhash) —
    * shared by [[imageDHash]], the pair search, and the persisted
    * index (which must not pay the count window). */
  private def dHashRows(media: DataFrame): DataFrame = {
    val enc = Encoders.product[(Long, Int, Int, String)]
    // full image decode is CPU per ROW while scan partitioning is per
    // BYTE — the r19 video finding holds here too (a single-file media
    // table otherwise decodes every image on one core); no-op when the
    // scan already yields enough splits (the cluster-scale case)
    Spread.rebalanced(
        media.filter(col("kind") === "image").select("media_id", "bytes"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          (id, w, h, dHashOf(w, h, px))
        }
      }(enc).toDF("media_id", "width", "height", "dhash")
  }

  /** Q14 fixed-point DCT-II basis, T(u)(x) = round(cos(π(2x+1)u/64)
    * · 2^14) for u < 8, x < 32 — the only 8 frequency rows pHash
    * reads. Computed with StrictMath (exactly specified, so the table
    * is identical on every JVM) and interpolated VERBATIM into the
    * DuckDB oracle SQL, so no cross-engine trig exists anywhere. Two
    * exact integer identities the hash contract leans on (spec-
    * pinned): row 0 is constant 2^14, and every row u > 0 sums to
    * EXACTLY 0 even after rounding (the ± cosine pairs round
    * symmetrically) — so a global brightness shift changes ONLY the
    * DC coefficient and pHash is exactly shift-invariant. */
  private[graft] val dctCosQ14: Array[Array[Long]] =
    Array.tabulate(8, 32)((u, x) =>
      StrictMath.round(StrictMath.cos(
        StrictMath.PI * (2 * x + 1) * u / 64.0) * 16384.0))

  /** DCT perceptual hash (pHash) over REAL decoded pixels — the
    * frequency-domain sibling of [[dHashOf]], robust where the
    * gradient hash is weak (smooth gradients, global contrast
    * changes), and like it a pure function of pixel CONTENT — the
    * same photo re-encoded through any lossless container collides.
    * All-integer, replayable in any engine:
    *
    *   1. integer luma per pixel ((77R+150G+29B)>>8), box-mean to a
    *      32x32 grid (cell (i,j) = floor mean of pixels with
    *      i = x·32/w, j = y·32/h) — downsample-only like
    *      [[resizePixels]], so images below 32x32 reject loudly;
    *   2. the 8x8 LOW-FREQUENCY corner of the 2D DCT in Q14 fixed
    *      point: F(u,v) = Σ_ij grid(j,i)·T(u)(i)·T(v)(j) over
    *      [[dctCosQ14]] (separable — 8x32 row pass then 8x8 column
    *      pass; |F| < 2^47, exact in Long);
    *   3. median thresholding: median = 32nd-smallest of the 63 AC
    *      coefficients (DC excluded — its magnitude is brightness,
    *      not structure); bit p = u·8+v set iff F(u,v) > median;
    *   4. the DC position (p = 0) is always 0, so the packed value
    *      Σ bit·2^(63-p) stays below 2^62 — sign-free on every
    *      engine — rendered as 16 hex chars.
    *
    * Returns the hex hash and the median (the oracle replays both).
    * Exactly brightness-shift invariant (see [[dctCosQ14]]) and
    * scale-invariant across sizes that box-mean to the same grid. */
  def pHashOf(w: Int, h: Int, px: Array[Int]): (String, Long) = {
    require(w >= 32 && h >= 32,
      s"pHash contract is downsample-only (>= 32x32), got ${w}x$h")
    val sums = new Array[Long](1024)
    val cnts = new Array[Long](1024)
    var y = 0
    while (y < h) {
      val j = y * 32 / h
      var x = 0
      while (x < w) {
        val i = x * 32 / w
        val p = px(y * w + x)
        val luma = (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) +
          29 * (p & 0xff)) >> 8
        sums(j * 32 + i) += luma; cnts(j * 32 + i) += 1
        x += 1
      }
      y += 1
    }
    // w,h >= 32 guarantees every cell is hit at least once
    val cell = Array.tabulate(1024)(k => sums(k) / cnts(k))
    val g = Array.ofDim[Long](8, 32) // row pass: frequency u along i
    var u = 0
    while (u < 8) {
      var j = 0
      while (j < 32) {
        var s = 0L; var i = 0
        while (i < 32) { s += dctCosQ14(u)(i) * cell(j * 32 + i); i += 1 }
        g(u)(j) = s; j += 1
      }
      u += 1
    }
    val f = Array.ofDim[Long](8, 8) // column pass: frequency v along j
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var s = 0L; var j = 0
        while (j < 32) { s += dctCosQ14(v)(j) * g(u)(j); j += 1 }
        f(u)(v) = s; v += 1
      }
      u += 1
    }
    val ac = new Array[Long](63)
    var k = 0
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u + v > 0) { ac(k) = f(u)(v); k += 1 }
        v += 1
      }
      u += 1
    }
    java.util.Arrays.sort(ac)
    val median = ac(31)
    var bits = 0L
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if ((u + v > 0) && f(u)(v) > median)
          bits |= 1L << (63 - (u * 8 + v))
        v += 1
      }
      u += 1
    }
    (f"$bits%016x", median)
  }

  /** Per-image pHash rows with exact-dup counts — the [[imageDHash]]
    * shape on the DCT hash: (media_id, width, height, phash, median,
    * n_same_hash). Decode + hash is one narrow map; only 16-byte
    * hashes shuffle for the count window. */
  def imagePHash(media: DataFrame): DataFrame = {
    val enc = Encoders.product[(Long, Int, Int, String, Long)]
    // decode + 32x32 box-mean + Q14 DCT per row — same per-row-CPU /
    // per-byte-scan mismatch as [[dHashRows]]; spread before the map
    Spread.rebalanced(
        media.filter(col("kind") === "image").select("media_id", "bytes"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          val (hash, med) = pHashOf(w, h, px)
          (id, w, h, hash, med)
        }
      }(enc).toDF("media_id", "width", "height", "phash", "median")
      .withColumn("n_same_hash",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("phash"))).cast("long"))
  }

  /** Persist the perceptual-hash index: one row per corpus image with
    * the hash and its two 32-bit halves pre-split for the Hamming
    * verify — the image parity of [[Dedup.writeNearDupIndex]]. Delta
    * batches then dedup against the STORE without re-decoding the
    * corpus ([[imageNearDupsAgainstIndex]]); a periodic batch
    * re-index absorbs accepted images. */
  def writeDHashIndex(media: DataFrame, dir: String): Unit =
    dHashRows(media).select(col("media_id"), col("dhash"),
      expr("cast(conv(substring(dhash, 1, 8), 16, 10) as long)").as("hi"),
      expr("cast(conv(substring(dhash, 9, 8), 16, 10) as long)").as("lo"))
      .write.mode("overwrite").parquet(s"$dir/dhash_index")

  /** Near-dup pairs of a delta image batch against the stored index:
    * same bands, same popcount verify as [[imageNearDupPairs]], but
    * the corpus side is the persisted hash table — the corpus is
    * never re-decoded, and the delta side (small by construction)
    * broadcasts into the index scan. Returns
    * (in_id, corpus_id, hamming). */
  def imageNearDupsAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, delta: DataFrame, maxHamming: Int = 8): DataFrame = {
    val idx = spark.read.parquet(s"$dir/dhash_index")
    val fresh = dHashRows(delta).select(col("media_id"), col("dhash"),
      expr("cast(conv(substring(dhash, 1, 8), 16, 10) as long)").as("hi"),
      expr("cast(conv(substring(dhash, 9, 8), 16, 10) as long)").as("lo"))
    def banded(df: DataFrame, side: String) = df.select(
      col("media_id").as(side),
      col("hi").as(s"hi_$side"), col("lo").as(s"lo_$side"),
      posexplode(array((0 until 4).map(b =>
        substring(col("dhash"), 1 + 4 * b, 4)): _*)).as(Seq("band_idx", "band_val")))
    broadcast(banded(fresh, "in_id"))
      .join(banded(idx, "corpus_id"), Seq("band_idx", "band_val"))
      .filter(col("in_id") =!= col("corpus_id"))
      .select("in_id", "corpus_id", "hi_in_id", "lo_in_id",
        "hi_corpus_id", "lo_corpus_id").distinct()
      .withColumn("hamming",
        (bit_count(col("hi_in_id").bitwiseXOR(col("hi_corpus_id"))) +
          bit_count(col("lo_in_id").bitwiseXOR(col("lo_corpus_id")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("in_id", "corpus_id", "hamming")
  }

  /** Hamming near-dup image pairs over [[imageDHash]] — the X67/X4
    * banded recipe applied to the perceptual hash: the 64-bit dHash
    * splits into four 16-bit bands (4 hex chars each); pairs agreeing
    * on ANY band become candidates (an r-bit-flip pair disagrees in at
    * most r bands, so any pair within maxHamming <= 16 flips spread
    * across <= 3 bands always shares one — and concentrated flips
    * share three); candidates dedup by (a, b) then verify exact
    * Hamming via the two 32-bit halves (bit_count is codegen'd).
    * Never an all-pairs join: candidate volume is bounded by band-key
    * multiplicity exactly like the SimHash path — and, like every
    * quadratic-capable join in this engine, the EXACT would-be volume
    * is measured in one reduced agg first and vetoes loudly over
    * budget ([[Guard]]): a corpus whose perceptual-hash diversity
    * saturates (screenshot farms, template imagery, the GenScale
    * replica fixture at 100x) has quadratically many TRUE dup pairs,
    * and that truth must be a contract, not a silent 28x-superlinear
    * run (measured sf1 -> sf10 before the guard). Budget knob:
    * `spark.graft.guard.dhashMaxAvgCandidatesPerRow`; pass 0 to
    * disable. Output: (id_a, id_b, hamming), id_a < id_b,
    * hamming <= maxHamming. */
  def imageNearDupPairs(media: DataFrame, maxHamming: Int = 6,
      maxAvgCandidatesPerRow: Double = 256.0): DataFrame =
    bandedHammingPairs(
      dHashRows(media).select(col("media_id"), col("dhash").as("__hash")),
      maxHamming, maxAvgCandidatesPerRow, "banded-dHash candidate",
      "group by exact dhash first (imageDHash) and pair only cluster " +
        "representatives")

  /** Hamming near-dup pairs over the DCT hash — [[imageNearDupPairs]]
    * on [[pHashOf]] instead of the gradient hash, the stronger
    * near-dup recipe (exactly brightness-shift invariant, stable
    * under box-mean rescales); same four 16-bit bands, same exact-
    * volume guard, same output shape (id_a, id_b, hamming). */
  def imagePHashNearDupPairs(media: DataFrame, maxHamming: Int = 16,
      maxAvgCandidatesPerRow: Double = 256.0): DataFrame = {
    val enc = Encoders.product[(Long, String)]
    val hashed = media.filter(col("kind") === "image")
      .select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          (r.getLong(0), pHashOf(w, h, px)._1)
        }
      }(enc).toDF("media_id", "__hash")
    bandedHammingPairs(hashed, maxHamming, maxAvgCandidatesPerRow,
      "banded-pHash candidate",
      "group by exact phash first (imagePHash) and pair only cluster " +
        "representatives")
  }

  /** The shared banded-Hamming pair core over any 16-hex 64-bit
    * perceptual hash frame (media_id, __hash): four 16-bit bands,
    * exact-volume [[Guard]] on the shared
    * `spark.graft.guard.dhashMaxAvgCandidatesPerRow` budget knob,
    * popcount verify folded on the two 32-bit halves. */
  private def bandedHammingPairs(hashed0: DataFrame, maxHamming: Int,
      maxAvgCandidatesPerRow: Double, guardName: String,
      guardHint: String): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 64)
    val hashed = hashed0
      .select(col("media_id"), col("__hash"),
        expr("cast(conv(substring(__hash, 1, 8), 16, 10) as long)").as("hi"),
        expr("cast(conv(substring(__hash, 9, 8), 16, 10) as long)").as("lo"))
    val banded = hashed.select(col("media_id"), col("__hash"), col("hi"), col("lo"),
      posexplode(array((0 until 4).map(b =>
        substring(col("__hash"), 1 + 4 * b, 4)): _*)).as(Seq("band_idx", "band_val")))
    if (maxAvgCandidatesPerRow > 0) {
      val row = banded.groupBy("band_idx", "band_val")
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("slots"),
          coalesce(sum(col("n").cast("decimal(38,0)") * (col("n") - 1)),
            lit(java.math.BigDecimal.ZERO)).as("pairs2x")).first()
      val rows = row.getLong(0) / 4
      val pairs = BigDecimal(row.getDecimal(1)) / 2
      Guard.verify(GuardReport(guardName, rows, pairs,
        BigDecimal(maxAvgCandidatesPerRow), perRow = true,
        "Saturated perceptual-hash diversity (template/screenshot-" +
          s"heavy corpora) makes near-dup pair truth quadratic; $guardHint, " +
          "or raise maxAvgCandidatesPerRow if this volume is intended."))
    }
    val a = banded.select(col("band_idx"), col("band_val"),
      col("media_id").as("id_a"), col("hi").as("hi_a"), col("lo").as("lo_a"))
    val b = banded.select(col("band_idx"), col("band_val"),
      col("media_id").as("id_b"), col("hi").as("hi_b"), col("lo").as("lo_b"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "hi_a", "lo_a", "hi_b", "lo_b").distinct()
      .withColumn("hamming",
        (bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
          bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Signature-sniffed mono PCM decode: RIFF/WAV ([[WavCodec]]) or
    * FLAC ([[graft.sources.Flac]]); anything else rejects loudly.
    * The audio analogue of [[decodeImage]]. */
  def decodeAudioPcm(b: Array[Byte]): Array[Int] = {
    if (b.length >= 4 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F') {
      val info = WavCodec.parse(b).getOrElse(
        throw new IllegalArgumentException("audio decode: malformed RIFF/WAV"))
      require(info.channels == 1, s"audio fingerprint contract is mono, got ${info.channels}")
      WavCodec.samples(b, info)
    } else if (b.length >= 4 && b(0) == 'f' && b(1) == 'L' && b(2) == 'a' && b(3) == 'C') {
      val (info, ch) = graft.sources.Flac.decode(b)
      require(info.channels == 1, s"audio fingerprint contract is mono, got ${info.channels}")
      ch(0)
    } else throw new IllegalArgumentException(
      "audio decode: neither RIFF/WAV nor FLAC signature")
  }

  /** Perceptual audio fingerprint over REAL decoded PCM — the audio
    * twin of [[imageDHash]] and the cross-CONTAINER dedup primitive:
    * the fingerprint is a function of the SAMPLES only, so the same
    * recording stored as WAV and as FLAC (lossless) collides. All
    * integer, replayable in any engine:
    *
    *   1. decode to mono PCM (WAV or FLAC, sniffed);
    *   2. window energies E_i = sum(s^2) over `windowSamples`-sample
    *      windows at `hopSamples` offsets (0, hop, 2*hop, ...; the
    *      tail window is the natural short one);
    *   3. 64 gradient bits: bit k set iff E_{k+1} > E_k (windows past
    *      the end contribute 0 bits) — energy-CONTOUR, so globally
    *      rescaling amplitude (or flipping polarity) cannot move a
    *      bit, the property that makes it a fingerprint rather than a
    *      checksum;
    *   4. rendered as 16 hex chars.
    *
    * Output: (media_id, n_samples, n_windows, fp, n_same_fp). At
    * scale the shuffle carries 16-byte fingerprints, never samples —
    * decode is a narrow per-row map, the count window partitions by
    * the fingerprint (high cardinality). */
  def audioFingerprint(media: DataFrame, windowSamples: Int = 256,
      hopSamples: Int = 128): DataFrame = {
    require(windowSamples > 0 && hopSamples > 0)
    val enc = Encoders.product[(Long, Long, Long, String)]
    // PCM decode (FLAC included) + energy windows are CPU per ROW —
    // spread a byte-sized single-split scan before the kernel map
    val hashed = Spread.rebalanced(
        media.filter(col("kind") === "audio").select("media_id", "bytes"))
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val pcm = decodeAudioPcm(r.getAs[Array[Byte]](1))
          val nWin = if (pcm.length == 0) 0 else (pcm.length + hopSamples - 1) / hopSamples
          val e = new Array[Long](nWin)
          var i = 0
          while (i < nWin) {
            val from = i * hopSamples
            val to = math.min(from + windowSamples, pcm.length)
            var s = 0L
            var k = from
            while (k < to) { val v = pcm(k).toLong; s += v * v; k += 1 }
            e(i) = s
            i += 1
          }
          var bits = 0L
          var k = 0
          while (k < 64 && k + 1 < nWin) {
            if (e(k + 1) > e(k)) bits |= 1L << k
            k += 1
          }
          (id, pcm.length.toLong, nWin.toLong, f"$bits%016x")
        }
      }(enc).toDF("media_id", "n_samples", "n_windows", "fp")
    hashed.withColumn("n_same_fp",
      count(lit(1)).over(org.apache.spark.sql.expressions.Window
        .partitionBy(col("fp"))).cast("long"))
  }

  /** Persist the audio-fingerprint index: one row per corpus
    * recording with its energy-contour fingerprint — the audio parity
    * of [[writeDHashIndex]]. Delta batches then dedup against the
    * STORE without re-decoding the corpus
    * ([[audioDupsAgainstIndex]]); a periodic batch re-index absorbs
    * accepted recordings. */
  def writeAudioFpIndex(media: DataFrame, dir: String,
      windowSamples: Int = 256, hopSamples: Int = 128): Unit =
    audioFingerprint(media, windowSamples, hopSamples)
      .select(col("media_id"), col("fp"))
      .write.mode("overwrite").parquet(s"$dir/audio_fp_index")

  /** Exact-duplicate recordings of a delta batch against the stored
    * fingerprint index: the energy-contour fp is the EXACT cross-
    * container dedup key (same recording as WAV and FLAC collides —
    * the mm_audio_dedup_fp contract), so the check is one equi-join
    * on the 16-char fp; the corpus is never re-decoded and the delta
    * side (small by construction) broadcasts into the index scan.
    * Returns (in_id, corpus_id). */
  def audioDupsAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, delta: DataFrame, windowSamples: Int = 256,
      hopSamples: Int = 128): DataFrame = {
    val idx = spark.read.parquet(s"$dir/audio_fp_index")
      .select(col("media_id").as("corpus_id"), col("fp"))
    val d = audioFingerprint(delta, windowSamples, hopSamples)
      .select(col("media_id").as("in_id"), col("fp"))
    broadcast(d).join(idx, Seq("fp"))
      .select(col("in_id"), col("corpus_id"))
  }

  /** Apply a TIFF/EXIF orientation (1–8) to decoded pixels — the
    * eight dihedral transforms, exact integer coordinate permutations
    * (no resampling): 1 identity, 2 mirror-X, 3 rotate 180, 4
    * mirror-Y, 5 transpose, 6 rotate 90 CW, 7 transverse, 8 rotate
    * 270 CW. Orientations 5–8 swap the output dims. Anything outside
    * 1–8 rejects loudly (0/absent means "treat as 1" and is the
    * CALLER's decision — silently accepting garbage would hide a
    * corrupt IFD). Returns (outW, outH, outPixels). */
  def applyOrientation(px: Array[Int], w: Int, h: Int, o: Int): (Int, Int, Array[Int]) = {
    require(o >= 1 && o <= 8, s"EXIF orientation $o out of 1..8")
    require(px.length == w * h, s"${px.length} pixels for ${w}x$h")
    val swap = o >= 5
    val ow = if (swap) h else w
    val oh = if (swap) w else h
    val out = new Array[Int](px.length)
    var sy = 0
    while (sy < h) {
      var sx = 0
      while (sx < w) {
        val i = o match {
          case 1 | 4 => sx
          case 2 | 3 => w - 1 - sx
          case 5 | 8 => sy
          case _ => h - 1 - sy // 6, 7
        }
        val j = o match {
          case 1 | 2 => sy
          case 3 | 4 => h - 1 - sy
          case 5 | 6 => sx
          case _ => w - 1 - sx // 7, 8
        }
        out(j * ow + i) = px(sy * w + sx)
        sx += 1
      }
      sy += 1
    }
    (ow, oh, out)
  }

  /** Orientation NORMALIZATION — the step a perceptual pipeline must
    * run before hashing or thumbnailing (the same photo tagged
    * orientation 6 vs 1 decodes to different pixel ARRAYS and would
    * hash apart; honoring the tag reunites them): per image, parse
    * the EXIF orientation ([[Exif.fromImage]]; absent or 0 means
    * upright), decode through the real codec, apply the dihedral
    * transform, and emit the upright dims plus a position-weighted
    * checksum over the transformed low channel — value AND place of
    * every pixel pinned, so the oracle replays the full coordinate
    * permutation. One narrow map; pixels never shuffle. */
  def exifOrientNormalize(media: DataFrame): DataFrame = {
    val enc = Encoders.product[(Long, Int, Long, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (_, exif) = Exif.fromImage(b)
          val o = exif.map(_.orientation).filter(_ >= 1).getOrElse(1)
          val (w, h, px) = decodeImage(b)
          val (ow, oh, out) = applyOrientation(px, w, h, o)
          var ck = 0L
          var k = 0
          while (k < out.length) {
            ck += (k + 1).toLong * (out(k) & 0xff)
            k += 1
          }
          (id, o, ow.toLong, oh.toLong, ck)
        }
      }(enc).toDF("media_id", "orientation", "out_w", "out_h", "checksum")
  }

  /** Per-FRAME statistics over (possibly animated) GIFs — the frame
    * sampling op for the crawl's video-lite format, built on
    * [[GifCodec.decodeFrames]]: one row per frame with placement,
    * timing, and pixel stats; the 1->N explode runs inside the
    * per-row map (frames never leave their executor as pixels). */
  def gifFrameStats(media: DataFrame): DataFrame = {
    val enc = Encoders.product[
      (Long, Long, Long, Long, Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val (_, _, frames) = GifCodec.decodeFrames(r.getAs[Array[Byte]](1))
          frames.map { f =>
            var sum = 0L; var mn = 255L; var mx = 0L
            var i = 0
            while (i < f.px.length) {
              val v = (f.px(i) & 0xff).toLong
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
              i += 1
            }
            (id, f.index.toLong, f.left.toLong, f.top.toLong,
              f.w.toLong, f.h.toLong, f.delayCs.toLong, sum, mn, mx)
          }
        }
      }(enc).toDF("media_id", "frame_idx", "left", "top", "width",
        "height", "delay_cs", "sum_gray", "min_gray", "max_gray")
  }

  /** Scene-CUT detection over the crawl's video-lite format — the
    * segmentation step ahead of frame sampling (sample one frame per
    * SCENE, not per fixed stride, so a 40-frame two-scene animation
    * contributes 2 representatives, not 8 near-dups): for every
    * ADJACENT frame pair of a [[GifCodec.decodeFrames]] animation,
    * the mean absolute luma difference (integer: floor(Σ|Δ|/n), luma
    * = the palette gray), a cut where it exceeds `cutThreshold`
    * STRICTLY (boundary pinned in the spec). The contract requires
    * FULL-SCREEN frames — sub-rectangle animations need the disposal
    * /compositing semantics [[GifCodec.decodeFrames]] deliberately
    * excludes, so they reject loudly by name rather than diffing
    * frames of different shapes. Emits one row per pair plus the
    * per-animation scene count (1 + cuts; a single-frame GIF has no
    * pairs and no rows). Decode + all pixel diffs run inside the
    * per-row map — pixels never leave their executor; only bounded
    * pair-stat rows shuffle for the count window. */
  def gifSceneCuts(media: DataFrame, cutThreshold: Long = 16L): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Boolean)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val (w, h, frames) = GifCodec.decodeFrames(r.getAs[Array[Byte]](1))
          frames.foreach { f =>
            require(f.left == 0 && f.top == 0 && f.w == w && f.h == h,
              s"scene-cut contract needs full-screen frames, got " +
                s"${f.w}x${f.h}@(${f.left},${f.top}) on a ${w}x$h screen")
          }
          frames.sliding(2).collect { case Seq(a, b) =>
            var sum = 0L
            var i = 0
            val n = w * h
            while (i < n) {
              sum += math.abs((b.px(i) & 0xff) - (a.px(i) & 0xff))
              i += 1
            }
            val mean = sum / n
            (id, b.index.toLong, n.toLong, sum, mean, mean > cutThreshold)
          }.toList
        }
      }(enc).toDF("media_id", "frame_idx", "n_px", "sum_abs_diff",
        "mean_diff", "is_cut")
      .withColumn("n_scenes",
        (lit(1L) + sum(col("is_cut").cast("long"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("media_id")))).cast("long"))
  }

  /** Scene-REPRESENTATIVE frame sampling — what [[gifSceneCuts]]
    * exists for: one frame per detected scene (the FIRST frame of
    * each, the deterministic choice every engine replays) instead of
    * per fixed stride, so a long static animation contributes one
    * representative and a rapid montage contributes many. Same
    * full-screen contract and STRICT threshold as the cut detector
    * (shared diff kernel — decode happens ONCE for cuts and reps);
    * emits per scene: index, representative frame, scene length in
    * frames, and the representative's pixel stats (sum + position-
    * weighted checksum, pinning value AND place of every sampled
    * pixel). A single-frame GIF is one scene represented by its only
    * frame. Everything runs inside the per-row map; only bounded
    * scene rows shuffle. */
  def gifSceneReps(media: DataFrame, cutThreshold: Long = 16L): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val (w, h, frames) = GifCodec.decodeFrames(r.getAs[Array[Byte]](1))
          frames.foreach { f =>
            require(f.left == 0 && f.top == 0 && f.w == w && f.h == h,
              s"scene-cut contract needs full-screen frames, got " +
                s"${f.w}x${f.h}@(${f.left},${f.top}) on a ${w}x$h screen")
          }
          val n = w * h
          val fa = frames.toArray
          val scene = new Array[Int](fa.length)
          var t = 1
          while (t < fa.length) {
            var sum = 0L
            var i = 0
            while (i < n) {
              sum += math.abs((fa(t).px(i) & 0xff) - (fa(t - 1).px(i) & 0xff))
              i += 1
            }
            scene(t) = scene(t - 1) + (if (sum / n > cutThreshold) 1 else 0)
            t += 1
          }
          val nScenes = scene(fa.length - 1) + 1
          (0 until nScenes).map { s =>
            val first = scene.indexOf(s)
            val len = scene.count(_ == s).toLong
            var sum = 0L; var ck = 0L
            var i = 0
            while (i < n) {
              val v = (fa(first).px(i) & 0xff).toLong
              sum += v; ck += (i + 1) * v
              i += 1
            }
            (id, s.toLong, fa(first).index.toLong, len, sum, ck)
          }
        }
      }(enc).toDF("media_id", "scene_idx", "rep_frame_idx",
        "n_frames", "rep_sum_gray", "rep_checksum")
  }

  /** Per-frame stats of MJPEG-in-AVI video ([[graft.sources.Avi]] —
    * VERDICT r16 item 4, the one video format whose pixels cross the
    * exact-oracle bar): strict RIFF walk + idx1 cross-check, then
    * every '00dc' frame decodes through the byte-identity-proven
    * [[JpegCodec]]; emits per frame the container header fields and
    * the gray-plane stats ([[gifFrameStats]]'s contract). Decode runs
    * inside the per-row map — pixels never leave their executor; only
    * bounded per-frame stat rows shuffle. */
  def aviFrameStats(media: DataFrame): DataFrame = {
    val enc = Encoders.product[
      (Long, Long, Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val avi = graft.sources.Avi.parseMjpeg(r.getAs[Array[Byte]](1))
          avi.frames.zipWithIndex.map { case (jpg, fi) =>
            val (w, h, px) = JpegCodec.decode(jpg)
            require(w == avi.width && h == avi.height,
              s"frame $fi decodes ${w}x$h inside a declared " +
                s"${avi.width}x${avi.height} stream")
            var sum = 0L; var mn = 255L; var mx = 0L
            var i = 0
            while (i < px.length) {
              val v = (px(i) & 0xff).toLong // gray: R=G=B in MJPEG fixtures
              sum += v; if (v < mn) mn = v; if (v > mx) mx = v
              i += 1
            }
            (id, fi.toLong, w.toLong, h.toLong, avi.usPerFrame.toLong,
              sum, mn, mx)
          }
        }
      }(enc).toDF("media_id", "frame_idx", "width", "height",
        "us_per_frame", "sum_gray", "min_gray", "max_gray")
  }

  /** Scene-cut detection over MJPEG-in-AVI — [[gifSceneCuts]]'s
    * contract (mean absolute gray diff of adjacent decoded frames,
    * cut strictly above `cutThreshold`, n_scenes = 1 + cuts) composed
    * onto the real video container + real JPEG decode path. */
  def aviSceneCuts(media: DataFrame, cutThreshold: Long = 16L): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Boolean)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val avi = graft.sources.Avi.parseMjpeg(r.getAs[Array[Byte]](1))
          val decoded = avi.frames.map { jpg =>
            val (w, h, px) = JpegCodec.decode(jpg)
            require(w == avi.width && h == avi.height,
              s"frame decodes ${w}x$h inside ${avi.width}x${avi.height}")
            px
          }
          val n = avi.width * avi.height
          decoded.sliding(2).zipWithIndex.collect { case (Seq(a, b2), t) =>
            var sum = 0L
            var i = 0
            while (i < n) {
              sum += math.abs((b2(i) & 0xff) - (a(i) & 0xff))
              i += 1
            }
            val mean = sum / n
            (id, (t + 1).toLong, n.toLong, sum, mean, mean > cutThreshold)
          }.toList
        }
      }(enc).toDF("media_id", "frame_idx", "n_px", "sum_abs_diff",
        "mean_diff", "is_cut")
      .withColumn("n_scenes",
        (lit(1L) + sum(col("is_cut").cast("long"))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("media_id")))).cast("long"))
  }

  /** Scene-REPRESENTATIVE frame sampling over MJPEG-in-AVI —
    * [[gifSceneReps]]'s contract (first frame of each detected scene,
    * scene length, rep pixel stats with the position-weighted
    * checksum pinning value AND place) on the real video path; shares
    * [[aviSceneCuts]]' diff kernel semantics (decode happens once for
    * the whole per-row pass). */
  def aviSceneReps(media: DataFrame, cutThreshold: Long = 16L): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val avi = graft.sources.Avi.parseMjpeg(r.getAs[Array[Byte]](1))
          val fa = avi.frames.map { jpg =>
            val (w, h, px) = JpegCodec.decode(jpg)
            require(w == avi.width && h == avi.height,
              s"frame decodes ${w}x$h inside ${avi.width}x${avi.height}")
            px
          }.toArray
          val n = avi.width * avi.height
          val scene = new Array[Int](fa.length)
          var t = 1
          while (t < fa.length) {
            var sum = 0L
            var i = 0
            while (i < n) {
              sum += math.abs((fa(t)(i) & 0xff) - (fa(t - 1)(i) & 0xff))
              i += 1
            }
            scene(t) = scene(t - 1) + (if (sum / n > cutThreshold) 1 else 0)
            t += 1
          }
          // a frameless AVI has no scenes (the cut/frames queries emit
          // empty for it too — don't index scene(-1))
          val nScenes = if (fa.isEmpty) 0 else scene(fa.length - 1) + 1
          (0 until nScenes).map { s =>
            val first = scene.indexOf(s)
            val len = scene.count(_ == s).toLong
            var sum = 0L; var ck = 0L
            var i = 0
            while (i < n) {
              val v = (fa(first)(i) & 0xff).toLong
              sum += v; ck += (i + 1) * v
              i += 1
            }
            (id, s.toLong, first.toLong, len, sum, ck)
          }
        }
      }(enc).toDF("media_id", "scene_idx", "rep_frame_idx",
        "n_frames", "rep_sum_gray", "rep_checksum")
  }

  /** Per-video perceptual SIGNATURE — one [[dHashOf]] per scene
    * representative (VERDICT r17 item 4, composing X238's scene reps
    * with X180's gradient hash): decode every MJPEG frame, segment
    * scenes by [[aviSceneCuts]]' diff kernel, hash the FIRST frame of
    * each scene. The ordered hash set is the video's identity under
    * the edits perceptual dedup cares about — trims drop prefix
    * hashes but keep the rest, re-encodes and global brightness
    * shifts leave every hash bit-identical (dHash compares adjacent
    * cell means, so a constant shift preserves every strict <).
    * Decode + segment + hash is one narrow per-row map; only
    * (media_id, scene_idx, 16-hex hash) rows leave the executor. */
  def videoSignature(media: DataFrame, cutThreshold: Long = 16L): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, String)]
    // decode cost is per ROW while scan partitioning is per BYTE: a
    // single-file corpus otherwise decodes on one core (measured r19
    // at sf10: 167k clips on ONE task, 180-227 s/query; spread, the
    // same chain runs on every core — PLANS.md r19)
    Spread.rebalanced(
        media.filter(col("kind") === "image").select("media_id", "bytes"))
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val avi = graft.sources.Avi.parseMjpeg(r.getAs[Array[Byte]](1))
          val fa = avi.frames.map { jpg =>
            val (w, h, px) = JpegCodec.decode(jpg)
            require(w == avi.width && h == avi.height,
              s"frame decodes ${w}x$h inside ${avi.width}x${avi.height}")
            px
          }.toArray
          val n = avi.width * avi.height
          val scene = new Array[Int](fa.length)
          var t = 1
          while (t < fa.length) {
            var sum = 0L
            var i = 0
            while (i < n) {
              sum += math.abs((fa(t)(i) & 0xff) - (fa(t - 1)(i) & 0xff))
              i += 1
            }
            scene(t) = scene(t - 1) + (if (sum / n > cutThreshold) 1 else 0)
            t += 1
          }
          val nScenes = if (fa.isEmpty) 0 else scene(fa.length - 1) + 1
          (0 until nScenes).map { s =>
            val first = scene.indexOf(s)
            // gray plane -> packed RGB for the shared luma kernel
            // (luma of (g,g,g) is exactly g: 77+150+29 = 256)
            val packed = fa(first).map(p => (p & 0xff) * 0x010101)
            (id, s.toLong, first.toLong,
              dHashOf(avi.width, avi.height, packed))
          }
        }
      }(enc).toDF("media_id", "scene_idx", "rep_frame_idx", "rep_dhash")
  }

  /** The hamming-verified SCENE-pair frame shared by
    * [[videoNearDupPairs]] and [[videoAlignOffsets]]: scene-rep
    * hashes pair through the X223 banded-Hamming discipline — four
    * 16-bit bands over DISTINCT hash values (exact recall for
    * `maxHamming <= 3` by pigeonhole, hence the hard cap; the guard
    * prices structural hash diversity while exact-copy mass only
    * reappears in the owner expansion, whose volume is true output).
    * Returns (id_a, scene_a, id_b, scene_b), id_a < id_b, distinct.
    * Never all-pairs: band-key join + guard, the image path's scale
    * shape. */
  private def videoScenePairs(media: DataFrame, cutThreshold: Long,
      maxHamming: Int, maxAvgCandidatesPerRow: Double): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16-bit banding is exact only to hamming 3; raise bands, not the cap")
    val hashed = videoSignature(media, cutThreshold)
      .select(col("media_id"), col("scene_idx"), col("rep_dhash"))
    // the banded join runs over DISTINCT hash VALUES, not scene rows:
    // exact duplicates (the very thing a dedup corpus is full of —
    // every copy of a video contributes the same hashes) would
    // otherwise inflate band-key multiplicity QUADRATICALLY in the
    // copy count; collapsing to values first means the guard prices
    // structural hash diversity and the duplicate mass only reappears
    // in the final owner expansion, whose volume IS the true-pair
    // output. (The image path documents the same recipe in its guard
    // hint: pair cluster representatives.)
    val vals = hashed.select(col("rep_dhash")).distinct()
      .select(col("rep_dhash"),
        expr("cast(conv(substring(rep_dhash, 1, 8), 16, 10) as long)").as("hi"),
        expr("cast(conv(substring(rep_dhash, 9, 8), 16, 10) as long)").as("lo"))
    val banded = vals.select(col("rep_dhash"), col("hi"), col("lo"),
      posexplode(array((0 until 4).map(b =>
        substring(col("rep_dhash"), 1 + 4 * b, 4)): _*))
        .as(Seq("band_idx", "band_val")))
    if (maxAvgCandidatesPerRow > 0) {
      val row = banded.groupBy("band_idx", "band_val")
        .agg(count(lit(1)).as("n"))
        .agg(coalesce(sum(col("n")), lit(0L)).as("slots"),
          coalesce(sum(col("n").cast("decimal(38,0)") * (col("n") - 1)),
            lit(java.math.BigDecimal.ZERO)).as("pairs2x")).first()
      val rows = row.getLong(0) / 4
      val pairs = BigDecimal(row.getDecimal(1)) / 2
      Guard.verify(GuardReport("banded video-signature candidate", rows, pairs,
        BigDecimal(maxAvgCandidatesPerRow), perRow = true,
        "Saturated scene-hash diversity (template/static-cam corpora) " +
          "makes video near-dup pair truth quadratic even across DISTINCT " +
          "hash values; tighten the scene sampling or raise " +
          "maxAvgCandidatesPerRow if this volume is intended."))
    }
    // near pairs between DIFFERENT hash values (hamming 1..maxHamming)
    val va = banded.select(col("band_idx"), col("band_val"),
      col("rep_dhash").as("dh_a"), col("hi").as("hi_a"), col("lo").as("lo_a"))
    val vb = banded.select(col("band_idx"), col("band_val"),
      col("rep_dhash").as("dh_b"), col("hi").as("hi_b"), col("lo").as("lo_b"))
    val valPairs = va.join(vb, Seq("band_idx", "band_val"))
      .filter(col("dh_a") < col("dh_b"))
      .select("dh_a", "dh_b", "hi_a", "lo_a", "hi_b", "lo_b").distinct()
      .filter((bit_count(col("hi_a").bitwiseXOR(col("hi_b"))) +
        bit_count(col("lo_a").bitwiseXOR(col("lo_b")))).cast("long")
        <= maxHamming)
      .select("dh_a", "dh_b")
    val owners = hashed.select(col("rep_dhash"), col("media_id"),
      col("scene_idx"))
    def oriented(df: DataFrame) = df.select(
      when(col("__ida") < col("__idb"), col("__ida")).otherwise(col("__idb")).as("id_a"),
      when(col("__ida") < col("__idb"), col("__sa")).otherwise(col("__sb")).as("scene_a"),
      when(col("__ida") < col("__idb"), col("__idb")).otherwise(col("__ida")).as("id_b"),
      when(col("__ida") < col("__idb"), col("__sb")).otherwise(col("__sa")).as("scene_b"))
    val near = oriented(valPairs
      .join(owners.select(col("rep_dhash").as("dh_a"),
        col("media_id").as("__ida"), col("scene_idx").as("__sa")), Seq("dh_a"))
      .join(owners.select(col("rep_dhash").as("dh_b"),
        col("media_id").as("__idb"), col("scene_idx").as("__sb")), Seq("dh_b"))
      .filter(col("__ida") =!= col("__idb")))
    // exact pairs: two videos carrying the SAME hash value (hamming 0)
    val same = owners.select(col("rep_dhash"),
        col("media_id").as("__ida"), col("scene_idx").as("__sa"))
      .join(owners.select(col("rep_dhash"),
        col("media_id").as("__idb"), col("scene_idx").as("__sb")),
        Seq("rep_dhash"))
      .filter(col("__ida") < col("__idb"))
      .select(col("__ida").as("id_a"), col("__sa").as("scene_a"),
        col("__idb").as("id_b"), col("__sb").as("scene_b"))
    near.union(same).distinct()
  }

  /** Video-level perceptual NEAR-DUP pairs — the multimodal dedup
    * matrix's last cell (text X25 / image X180 / audio X181 → video):
    * two clips that share scenes (a trim, a re-encode, a
    * brightness-shifted or watermark-free copy) collide on
    * [[videoSignature]] overlap. The [[videoScenePairs]] core reduces
    * to the video level: `n_shared_scenes` = the SMALLER side's
    * distinct matched scene count (symmetric, and immune to one scene
    * matching twice), kept at `>= minSharedScenes`.
    * Output: (id_a, id_b, n_shared_scenes), id_a < id_b. */
  def videoNearDupPairs(media: DataFrame, cutThreshold: Long = 16L,
      maxHamming: Int = 3, minSharedScenes: Long = 2L,
      maxAvgCandidatesPerRow: Double = 256.0): DataFrame =
    nearDupReduce(videoScenePairs(media, cutThreshold, maxHamming,
      maxAvgCandidatesPerRow), minSharedScenes)

  /** Video-level reduce of a scene-pair frame (shared by
    * [[videoNearDupPairs]] and [[videoNearDupAdjudicated]]). */
  private def nearDupReduce(pairs: DataFrame,
      minSharedScenes: Long): DataFrame =
    pairs.groupBy(col("id_a"), col("id_b"))
      .agg(least(countDistinct(col("scene_a")),
        countDistinct(col("scene_b"))).cast("long").as("n_shared_scenes"))
      .filter(col("n_shared_scenes") >= minSharedScenes)

  /** Modal-offset reduce of a scene-pair frame (shared by
    * [[videoAlignOffsets]] and [[videoNearDupAdjudicated]]). */
  private def alignReduce(pairs: DataFrame, minAligned: Long): DataFrame = {
    val perOffset = pairs
      .groupBy(col("id_a"), col("id_b"),
        (col("scene_b") - col("scene_a")).as("scene_offset"))
      .agg(countDistinct(col("scene_a")).cast("long").as("n_aligned"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a"), col("id_b"))
      .orderBy(col("n_aligned").desc, col("scene_offset").asc)
    perOffset
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
      .filter(col("n_aligned") >= minAligned)
      .select("id_a", "id_b", "scene_offset", "n_aligned")
  }

  /** Temporal ALIGNMENT of near-dup video pairs — the adjudication
    * signal a dedup pipeline reads after [[videoNearDupPairs]] fires:
    * for each matched pair, the MODAL scene-index offset
    * (`scene_b - scene_a`) over the hamming-verified scene matches,
    * with the aligned-scene count at that offset. A pure re-encode or
    * brightness copy aligns at offset 0 across every scene; a
    * head-trimmed copy aligns at a single NEGATIVE offset (its scene
    * k is the original's scene k+|offset|); a coincidental one-scene
    * collision has no consistent offset and a low `n_aligned`.
    * Deterministic tie order: (aligned count desc, offset asc).
    * Output: (id_a, id_b, scene_offset, n_aligned), id_a < id_b,
    * n_aligned >= minAligned. Same scale shape as the pair search —
    * one extra vocabulary-bounded aggregation over the scene-pair
    * frame, nothing new shuffles. */
  def videoAlignOffsets(media: DataFrame, cutThreshold: Long = 16L,
      maxHamming: Int = 3, minAligned: Long = 2L,
      maxAvgCandidatesPerRow: Double = 256.0): DataFrame =
    alignReduce(videoScenePairs(media, cutThreshold, maxHamming,
      maxAvgCandidatesPerRow), minAligned)

  /** The one-pass ADJUDICATED form (VERDICT r18 item 6 — the r14
    * funnel one-pass discipline applied to the video pair): a dedup
    * pipeline that fires the pair search always reads the alignment
    * next, and [[videoNearDupPairs]] + [[videoAlignOffsets]] run
    * separately re-decode every clip and re-run the banded join —
    * the decode is the dominant cost of both. This computes the
    * hamming-verified scene-pair frame ONCE, cuts it (two consumers —
    * uncut, each agg branch would re-execute the whole decode+join
    * subplan), and derives both reduces from the cut frame: pairs
    * that share >= minSharedScenes scenes AND carry a consistent
    * modal offset (>= minAligned aligned scenes), with both signals
    * on one row. Measured at sf0.1: the composite prices ~one of the
    * two single-signal queries, not their sum (PLANS.md r19). The
    * single-signal forms stay registered for oracle isolation.
    * Output: (id_a, id_b, n_shared_scenes, scene_offset, n_aligned),
    * id_a < id_b.
    *
    * Storage contract: the returned frame's leaves are the
    * eagerly-materialized scene-pair cut (executor storage). In a
    * long-lived session call [[freeAdjudicatedCut]] on the RETURNED
    * frame once its consumer is materialized — otherwise each
    * invocation accumulates a persisted RDD until driver GC +
    * ContextCleaner get to it (the [[CorpusMix.freeStages]]
    * discipline). */
  def videoNearDupAdjudicated(media: DataFrame, cutThreshold: Long = 16L,
      maxHamming: Int = 3, minSharedScenes: Long = 2L,
      minAligned: Long = 2L,
      maxAvgCandidatesPerRow: Double = 256.0): DataFrame = {
    val pairs = Frames.materializeCut(
      videoScenePairs(media, cutThreshold, maxHamming,
        maxAvgCandidatesPerRow))
    nearDupReduce(pairs, minSharedScenes)
      .join(alignReduce(pairs, minAligned), Seq("id_a", "id_b"))
      .select(col("id_a"), col("id_b"), col("n_shared_scenes"),
        col("scene_offset"), col("n_aligned"))
  }

  /** Release the executor storage behind a [[videoNearDupAdjudicated]]
    * result once its consumer is materialized — the frame's leaves ARE
    * the checkpointed scene-pair cut, so freeing the returned frame
    * frees the cut. Safe to call on any frame (non-checkpoint leaves
    * are ignored). */
  def freeAdjudicatedCut(df: DataFrame): Unit = Frames.free(df)

  /** Persist the video-signature index — the [[writeDHashIndex]]
    * lifecycle for video: one (media_id, scene_idx, rep_dhash, hi,
    * lo) row per scene representative, built once per corpus
    * snapshot so ingest-time checks never re-decode the corpus. */
  def writeVideoSignatureIndex(media: DataFrame, dir: String,
      cutThreshold: Long = 16L): Unit =
    videoSignature(media, cutThreshold)
      .select(col("media_id"), col("scene_idx"), col("rep_dhash"),
        expr("cast(conv(substring(rep_dhash, 1, 8), 16, 10) as long)").as("hi"),
        expr("cast(conv(substring(rep_dhash, 9, 8), 16, 10) as long)").as("lo"))
      .write.mode("overwrite").parquet(s"$dir/video_sig_index")

  /** Video near-dup pairs of a delta batch against the stored
    * signature index ([[imageNearDupsAgainstIndex]]'s contract at the
    * video level): the delta side decodes/segments/hashes fresh
    * (small by construction — it broadcasts), the corpus side is the
    * persisted hash table, candidates come from the same 4x16-bit
    * band join (exact recall for the hamming <= 3 cap), and pairs
    * reduce to (in_id, corpus_id, n_shared_scenes) by the smaller
    * side's distinct matched scene count. */
  def videoNearDupsAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      dir: String, delta: DataFrame, cutThreshold: Long = 16L,
      maxHamming: Int = 3, minSharedScenes: Long = 2L): DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      "4x16-bit banding is exact only to hamming 3; raise bands, not the cap")
    val idx = spark.read.parquet(s"$dir/video_sig_index")
    val fresh = videoSignature(delta, cutThreshold)
      .select(col("media_id"), col("scene_idx"), col("rep_dhash"),
        expr("cast(conv(substring(rep_dhash, 1, 8), 16, 10) as long)").as("hi"),
        expr("cast(conv(substring(rep_dhash, 9, 8), 16, 10) as long)").as("lo"))
    def banded(df: DataFrame, side: String) = df.select(
      col("media_id").as(side), col("scene_idx").as(s"scene_$side"),
      col("hi").as(s"hi_$side"), col("lo").as(s"lo_$side"),
      posexplode(array((0 until 4).map(b =>
        substring(col("rep_dhash"), 1 + 4 * b, 4)): _*))
        .as(Seq("band_idx", "band_val")))
    broadcast(banded(fresh, "in_id"))
      .join(banded(idx, "corpus_id"), Seq("band_idx", "band_val"))
      .filter(col("in_id") =!= col("corpus_id"))
      .select("in_id", "scene_in_id", "corpus_id", "scene_corpus_id",
        "hi_in_id", "lo_in_id", "hi_corpus_id", "lo_corpus_id").distinct()
      .filter((bit_count(col("hi_in_id").bitwiseXOR(col("hi_corpus_id"))) +
        bit_count(col("lo_in_id").bitwiseXOR(col("lo_corpus_id")))).cast("long")
        <= maxHamming)
      .groupBy(col("in_id"), col("corpus_id"))
      .agg(least(countDistinct(col("scene_in_id")),
        countDistinct(col("scene_corpus_id"))).cast("long")
        .as("n_shared_scenes"))
      .filter(col("n_shared_scenes") >= minSharedScenes)
  }

  /** Orientation-normalized perceptual hash — the REUNITE-THE-PHOTO
    * composition X198 and X209 exist for: the same photo stored
    * upright and stored physically-rotated-with-an-orientation-tag
    * decodes to DIFFERENT pixel arrays and would pHash apart; running
    * the dihedral normalization first makes them collide, so the
    * perceptual dedup pass catches camera-rotated duplicates. Per
    * row: EXIF orientation (absent = upright), decode, exact dihedral
    * transform, [[pHashOf]] of the NORMALIZED pixels; emits the
    * normalized dims + hash + exact-dup count. Decode + transform +
    * hash is one narrow map; only 16-byte hashes shuffle. */
  def orientNormalizedPHash(media: DataFrame): DataFrame = {
    val enc = Encoders.product[(Long, Int, Long, Long, String)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val (_, exif) = Exif.fromImage(b)
          val o = exif.map(_.orientation).filter(_ >= 1).getOrElse(1)
          val (w, h, px) = decodeImage(b)
          val (ow, oh, out) = applyOrientation(px, w, h, o)
          (id, o, ow.toLong, oh.toLong, pHashOf(ow, oh, out)._1)
        }
      }(enc).toDF("media_id", "orientation", "out_w", "out_h", "phash")
      .withColumn("n_same_hash",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("phash"))).cast("long"))
  }

  /** Letterbox PAD to square — the aspect normalization a vision
    * ingest runs before batching fixed-shape tensors (resize alone
    * distorts aspect; pad-then-resize preserves it): the decoded
    * image centers on a side×side canvas (side = max(w, h)) filled
    * with a constant pad color, offsets = floor((side - dim) / 2) —
    * all-integer placement, exactly replayable. Emits the canvas
    * dims, the placement offsets, and a position-weighted checksum
    * over the padded low channel (pad pixels included — value AND
    * place of every canvas cell pinned). One narrow map. */
  def imageLetterboxStats(media: DataFrame, padColor: Int = 0): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long, Long)]
    val pv = (padColor & 0xff).toLong
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          val side = math.max(w, h)
          val ox = (side - w) / 2
          val oy = (side - h) / 2
          // checksum over the virtual canvas without materializing it
          var ck = 0L
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val k = (oy + y) * side + (ox + x)
              ck += (k + 1).toLong * (px(y * w + x) & 0xff)
              x += 1
            }
            y += 1
          }
          if (pv != 0) {
            // pad cells: total weight of all cells minus image cells
            val n = side.toLong * side
            var imgW = 0L
            y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                imgW += (oy + y).toLong * side + (ox + x) + 1
                x += 1
              }
              y += 1
            }
            ck += pv * (n * (n + 1) / 2 - imgW)
          }
          (id, w.toLong, h.toLong, side.toLong, ox.toLong, oy.toLong, ck)
        }
      }(enc).toDF("media_id", "width", "height", "side",
        "offset_x", "offset_y", "checksum")
  }

  /** Silence TRIM over REAL decoded PCM — the lead-in/lead-out
    * removal an audio ingest runs before feature extraction: a
    * `windowSamples`-sample window is silent when its energy
    * sum(s²) <= threshold; leading and trailing runs of silent FULL
    * windows are dropped (the partial tail window never trims — it
    * has no full-window energy), everything between the first and
    * last loud window stays (interior silence is content). Emits the
    * trim accounting plus stats of the KEPT range. All-integer,
    * exactly replayable; one narrow map. */
  def audioTrimSilenceStats(media: DataFrame, windowSamples: Int,
      energyThreshold: Long): DataFrame = {
    require(windowSamples > 0 && energyThreshold >= 0)
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "audio").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val pcm = decodeAudioPcm(r.getAs[Array[Byte]](1))
          val nWin = pcm.length / windowSamples // full windows only
          val loud = new Array[Boolean](nWin)
          var i = 0
          while (i < nWin) {
            var e = 0L
            var k = i * windowSamples
            val to = k + windowSamples
            while (k < to) { val v = pcm(k).toLong; e += v * v; k += 1 }
            loud(i) = e > energyThreshold
            i += 1
          }
          val first = loud.indexOf(true)
          val last = loud.lastIndexOf(true)
          // keep range: first loud window start .. last loud window
          // end; the partial tail past the last full window is
          // content only when the LAST full window is loud (it rides
          // along); all-silent input keeps nothing
          val from = if (first < 0) 0 else first * windowSamples
          val end =
            if (first < 0) 0
            else if (last == nWin - 1) pcm.length
            else (last + 1) * windowSamples
          var energy = 0L; var ck = 0L
          var k = from
          var pos = 0
          while (k < end) {
            val v = pcm(k).toLong
            energy += v * v
            ck += (pos + 1) * v
            pos += 1; k += 1
          }
          val kept = (end - from).toLong
          (id, pcm.length.toLong, kept,
            if (first < 0) 0L else from.toLong / windowSamples,
            if (first < 0) nWin.toLong else (nWin - 1 - last).toLong,
            energy, ck)
        }
      }(enc).toDF("media_id", "n_in", "n_kept", "n_lead_windows_cut",
        "n_tail_windows_cut", "energy", "checksum")
  }

  /** Integer audio DECIMATION resample over REAL decoded PCM — the
    * audio twin of [[resizePixels]] and the rate-normalize step of an
    * audio ingest (every recording to one sample rate before feature
    * extraction). Output sample k is the TRUNCATING mean of the k-th
    * non-overlapping `factor`-sample window (Java `/` — division
    * toward zero, which is what Spark's integer `div` and DuckDB's
    * integer `//` also do, so signed sums replay identically in every
    * engine involved; Python-style floored division would diverge on
    * negative sums); the incomplete tail window is dropped (n_out =
    * n_in / factor — the only boundary semantics that keeps every
    * output sample a full-window mean). Anti-alias filtering is PCM-domain
    * semantics this contract deliberately does not define — decimation
    * is the deterministic, exactly-replayable part. Emits stats of
    * the RESAMPLED stream: energy, peak, and a position-weighted
    * checksum that pins every output sample's value AND place. One
    * narrow map; samples never shuffle. */
  def audioResampleStats(media: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"decimation factor must be >= 1, got $factor")
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "audio").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val pcm = decodeAudioPcm(r.getAs[Array[Byte]](1))
          val nOut = pcm.length / factor
          var energy = 0L; var peak = 0L; var ck = 0L
          var k = 0
          while (k < nOut) {
            var s = 0L
            var i = k * factor
            val to = i + factor
            while (i < to) { s += pcm(i); i += 1 }
            val v = s / factor
            energy += v * v
            val a = math.abs(v); if (a > peak) peak = a
            ck += (k + 1) * v
            k += 1
          }
          (id, pcm.length.toLong, nOut.toLong, energy, peak, ck)
        }
      }(enc).toDF("media_id", "n_in", "n_out", "energy", "peak", "checksum")
  }

  /** Channel NORMALIZATION: mix multi-channel WAV down to mono — the
    * step before any of the mono-contract audio ops (fingerprint,
    * resample, segmenting) can run on stereo field recordings. Frame
    * k of the mono stream = TRUNCATING mean of the frame's channel
    * samples ((L+R)/2 toward zero — same portable semantics as
    * [[audioResampleStats]], and the DC-exact choice: a mono input
    * passes through bit-identical as the 1-channel case). 16-bit PCM,
    * 1 or 2 channels; anything else rejects loudly via the parser
    * contract. Emits stats of the MIXED stream (energy / peak /
    * position-weighted checksum) so the oracle replays the mix
    * arithmetic; one narrow map, samples never shuffle. */
  def audioMixdownStats(media: DataFrame): DataFrame = {
    val enc = Encoders.product[(Long, Int, Long, Long, Long, Long)]
    media.filter(col("kind") === "audio").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          val info = WavCodec.parse(b).getOrElse(
            throw new IllegalArgumentException("mixdown: not a RIFF/WAV stream"))
          require(info.channels == 1 || info.channels == 2,
            s"mixdown contract is 1 or 2 channels, got ${info.channels}")
          val raw = WavCodec.samples(b, info) // interleaved
          val ch = info.channels
          val n = raw.length / ch
          var energy = 0L; var peak = 0L; var ck = 0L
          var k = 0
          while (k < n) {
            val v =
              if (ch == 1) raw(k).toLong
              else (raw(2 * k).toLong + raw(2 * k + 1)) / 2
            energy += v * v
            val a = math.abs(v); if (a > peak) peak = a
            ck += (k + 1) * v
            k += 1
          }
          (id, ch, n.toLong, energy, peak, ck)
        }
      }(enc).toDF("media_id", "n_channels", "n_frames",
        "energy", "peak", "checksum")
  }

  /** Integer PEAK normalization over REAL decoded PCM — the loudness
    * step of the audio ingest (every recording to full scale before
    * fingerprinting / feature extraction, so level differences between
    * sources stop mattering): gain_q15 = (32767·2^15) / peak (integer,
    * peak = max |sample|), output sample = s·gain_q15 / 2^15 with
    * TRUNCATING division (toward zero — Java `/` and DuckDB `//`
    * agree, same portable semantics as [[audioResampleStats]]).
    * |s| <= peak bounds every output inside [-32767, 32767] by
    * construction (a full-scale -32768 input normalizes to -32767);
    * an all-silent stream passes through at unity (gain 2^15). Emits
    * in/out peaks, the applied gain, and energy + position-weighted
    * checksum of the NORMALIZED stream so the oracle replays the gain
    * arithmetic sample-by-sample. One narrow map; samples never
    * shuffle. */
  def audioNormalizeStats(media: DataFrame): DataFrame = {
    val enc = Encoders.product[(Long, Long, Long, Long, Long, Long, Long)]
    media.filter(col("kind") === "audio").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val pcm = decodeAudioPcm(r.getAs[Array[Byte]](1))
          var peak = 0L
          var k = 0
          while (k < pcm.length) {
            val a = math.abs(pcm(k).toLong); if (a > peak) peak = a
            k += 1
          }
          val gain = if (peak == 0L) 32768L else (32767L * 32768L) / peak
          var energy = 0L; var pout = 0L; var ck = 0L
          k = 0
          while (k < pcm.length) {
            val v = pcm(k).toLong * gain / 32768L
            energy += v * v
            val a = math.abs(v); if (a > pout) pout = a
            ck += (k + 1) * v
            k += 1
          }
          (id, pcm.length.toLong, peak, gain, pout, energy, ck)
        }
      }(enc).toDF("media_id", "n", "peak_in", "gain_q15", "peak_out",
        "energy", "checksum")
  }

  /** Skin-tone pixel ratio over REAL decoded color pixels — the
    * SAFETY-FILTER slot of the multimodal ingest, filled with an
    * honest deterministic heuristic: the classic public RGB rule
    * (Peer/Kovac: R>95 ∧ G>40 ∧ B>20 ∧ max−min>15 ∧ |R−G|>15 ∧ R>G ∧
    * R>B), counted exactly and reported in integer parts-per-million
    * (floor), flagged STRICTLY above `thresholdPpm`. The contract is
    * the PLUMBING — decode, per-pixel classify, exact ratio, flag —
    * which is what survives when a learned classifier replaces the
    * rule (the rule is a pure function slot, like the stubbed lossy
    * codecs); a rule this simple is NOT a content-safety judgment and
    * the scaladoc says so. One narrow map; pixels never shuffle. */
  def imageSkinRatio(media: DataFrame,
      thresholdPpm: Long = 200000L): DataFrame = {
    val enc = Encoders.product[(Long, Int, Int, Long, Long, Long, Boolean)]
    media.filter(col("kind") === "image").select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val (w, h, px) = decodeImage(r.getAs[Array[Byte]](1))
          var nSkin = 0L
          var i = 0
          while (i < px.length) {
            val p = px(i)
            val red = (p >> 16) & 0xff
            val g = (p >> 8) & 0xff
            val b = p & 0xff
            val mx = math.max(red, math.max(g, b))
            val mn = math.min(red, math.min(g, b))
            if (red > 95 && g > 40 && b > 20 && mx - mn > 15 &&
              math.abs(red - g) > 15 && red > g && red > b) nSkin += 1
            i += 1
          }
          val n = px.length.toLong
          val ppm = if (n == 0) 0L else nSkin * 1000000L / n
          (id, w, h, n, nSkin, ppm, ppm > thresholdPpm)
        }
      }(enc).toDF("media_id", "width", "height", "n_px", "n_skin",
        "skin_ppm", "flagged")
  }

  /** Real pixel decode for 24-bit uncompressed (BI_RGB) BMP — the
    * fourth and simplest still-image decoder: LE header, explicit
    * data offset, 4-byte-padded BGR rows, bottom-up unless the height
    * is negative (top-down). Anything else (palettized, RLE, 16/32
    * bpp) rejects loudly by name. */
  object BmpCodec {
    def decode(b: Array[Byte]): (Int, Int, Array[Int]) = {
      def fail(off: Int, msg: String): Nothing =
        throw new IllegalArgumentException(s"BMP: $msg (offset $off)")
      def le16(i: Int): Int = {
        if (i + 2 > b.length) fail(i, "truncated")
        (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
      }
      def le32(i: Int): Int = le16(i) | (le16(i + 2) << 16)
      if (b.length < 54 || b(0) != 'B' || b(1) != 'M') fail(0, "bad signature")
      val dataOff = le32(10)
      val hdrSize = le32(14)
      if (hdrSize < 40) fail(14, s"DIB header size $hdrSize (contract: BITMAPINFOHEADER+)")
      val w = le32(18)
      val hRaw = le32(22)
      val topDown = hRaw < 0
      val h = math.abs(hRaw)
      if (w <= 0 || h <= 0 || w > (1 << 15) || h > (1 << 15))
        fail(18, s"dims ${w}x$hRaw out of contract")
      if (le16(28) != 24) fail(28, s"${le16(28)} bpp (contract: 24)")
      if (le32(30) != 0) fail(30, s"compression ${le32(30)} (contract: BI_RGB)")
      val stride = (w * 3 + 3) & ~3
      if (dataOff < 54 || dataOff.toLong + stride.toLong * h > b.length)
        fail(10, s"pixel data [$dataOff, +${stride.toLong * h}) overruns ${b.length} bytes")
      val out = new Array[Int](w * h)
      var y = 0
      while (y < h) {
        val srcRow = dataOff + (if (topDown) y else h - 1 - y) * stride
        var x = 0
        while (x < w) {
          val o = srcRow + 3 * x
          out(y * w + x) = ((b(o + 2) & 0xff) << 16) |
            ((b(o + 1) & 0xff) << 8) | (b(o) & 0xff)
          x += 1
        }
        y += 1
      }
      (w, h, out)
    }
  }

  /** Signature-sniffed dispatch to the real pixel decoders. */
  def decodeImage(b: Array[Byte]): (Int, Int, Array[Int]) = {
    if (b.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      GifCodec.decode(b)
    else if (b.length >= 8 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
      b(2) == 'N' && b(3) == 'G')
      PngCodec.decode(b)
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8)
      JpegCodec.decode(b)
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M')
      BmpCodec.decode(b)
    else throw new IllegalArgumentException(
      "image decode: not a GIF, PNG, JPEG, or BMP signature")
  }

  /** Wrap any table with a string payload column into the canonical
    * media shape (deterministic test payloads; real pipelines would
    * read binary files or parquet binary columns directly). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      kindExpr: org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      kindExpr.as("kind"),
      col(payloadCol).cast("binary").as("bytes"))

  /** Decode metadata per media row (dims / frames / sample rate) —
    * partition-batched, typed output. Image dimensions are REAL when
    * the payload is a PNG/JPEG container ([[ImageHeader.dims]], a pure
    * header parse); payloads that are not image containers (the stubbed
    * audio/video kinds, arbitrary test bytes) keep [[FakeCodec]]'s
    * deterministic pseudo-metadata. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = Encoders.product[MediaMeta]
    media.select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0); val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, h) = ImageHeader.dims(bytes).getOrElse(FakeCodec.imageDims(bytes))
          MediaMeta(id, kind, bytes.length.toLong, w, h,
            FakeCodec.frameCount(bytes), FakeCodec.sampleRate(kind))
        }
      }(enc).toDF()
  }

  /** Feature extraction: fixed-dim float vector per media item (here:
    * a 16-dim pseudo-embedding from sampled bytes) + checksum. The
    * output feeds [[Similarity]] unchanged. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = Encoders.product[MediaFeature]
    media.select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val plane = FakeCodec.samplePlane(bytes, stride = 7, maxLen = dim)
          val padded = if (plane.length >= dim) plane.take(dim)
            else plane ++ Array.fill(dim - plane.length)(0f)
          MediaFeature(id, bytes.length.toLong, FakeCodec.checksum(bytes), padded)
        }
      }(enc).toDF()
  }

  /** Frame sampling for video-kind rows: explode each payload into
    * every k-th "frame" (stub: fixed-size byte windows), keyed
    * (media_id, frame_idx) — the 1->N generator shape. */
  def sampleFrames(media: DataFrame, everyK: Int = 4, frameBytes: Int = 32): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY)
    media.filter(col("kind") === "video").select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val nFrames = math.max(1, bytes.length / frameBytes)
          (0 until nFrames by everyK).iterator.map { f =>
            val from = f * frameBytes
            (id, f, java.util.Arrays.copyOfRange(bytes, from,
              math.min(from + frameBytes, bytes.length)))
          }
        }
      }(enc).toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Real WAV (RIFF PCM) container codec — pure JVM, public format.
    * The audio analogue of [[ImageHeader]]: `parse` walks RIFF chunks
    * to the fmt/data pair (unknown chunks skipped, odd sizes padded per
    * spec), `samples` yields 16-bit little-endian PCM as ints, and
    * `encodePcm16` produces real mono files for fixtures. Compressed
    * audio (MP3/AAC/Vorbis) stays behind the documented [[FakeCodec]]
    * stub — no codec library ships in this environment — but WAV is
    * uncompressed, so this path is a complete real decode. */
  object WavCodec {
    final case class WavInfo(sampleRate: Int, channels: Int,
        bitsPerSample: Int, dataOffset: Int, dataBytes: Int) {
      def nSamples: Int = dataBytes / ((bitsPerSample / 8) * channels)
    }

    private def le32(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8) |
        ((b(i + 2) & 0xff) << 16) | ((b(i + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], i: Int): Int =
      (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    def parse(b: Array[Byte]): Option[WavInfo] = {
      if (b.length < 44 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
      var i = 12
      var rate = 0
      var channels = 0
      var bits = 0
      var fmtSeen = false
      while (i + 8 <= b.length) {
        val id = tag(b, i)
        val len = le32(b, i + 4)
        // Long arithmetic: a near-2^31 length would wrap an Int sum
        // and sneak past the bounds check
        if (len < 0 || i.toLong + 8 + len > b.length) return None
        if (id == "fmt ") {
          if (len < 16 || le16(b, i + 8) != 1) return None // PCM only
          channels = le16(b, i + 10)
          rate = le32(b, i + 12)
          bits = le16(b, i + 22)
          fmtSeen = true
        } else if (id == "data") {
          if (!fmtSeen) return None
          return Some(WavInfo(rate, channels, bits, i + 8, len))
        }
        i += 8 + len + (len & 1) // chunks pad to even length
      }
      None
    }

    /** Decoded samples of a parsed 16-bit file, channel-interleaved. */
    def samples(b: Array[Byte], info: WavInfo): Array[Int] = {
      require(info.bitsPerSample == 16, s"${info.bitsPerSample}-bit PCM unsupported")
      val n = info.dataBytes / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) {
        out(i) = le16(b, info.dataOffset + 2 * i).toShort.toInt // sign-extend
        i += 1
      }
      out
    }

    def encodePcm16(sampleRate: Int, pcm: Array[Int]): Array[Byte] = {
      val dataBytes = pcm.length * 2
      val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1).putShort(1) // PCM, mono
      out.putInt(sampleRate).putInt(sampleRate * 2)
      out.putShort(2).putShort(16) // block align, bits
      out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      pcm.foreach(s => out.putShort(s.toShort))
      out.array()
    }

    /** Stereo fixture encoder: interleaved L/R 16-bit PCM frames. */
    def encodePcm16Stereo(sampleRate: Int, left: Array[Int],
        right: Array[Int]): Array[Byte] = {
      require(left.length == right.length,
        s"stereo channels differ: ${left.length} vs ${right.length} frames")
      val dataBytes = left.length * 4
      val out = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataBytes)
      out.put("WAVE".getBytes("US-ASCII"))
      out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      out.putShort(1).putShort(2) // PCM, stereo
      out.putInt(sampleRate).putInt(sampleRate * 4)
      out.putShort(4).putShort(16) // block align, bits
      out.put("data".getBytes("US-ASCII")).putInt(dataBytes)
      var i = 0
      while (i < left.length) {
        out.putShort(left(i).toShort); out.putShort(right(i).toShort)
        i += 1
      }
      out.array()
    }
  }

  /** Real MP4 / ISO BMFF (ISO/IEC 14496-12) container codec — pure
    * JVM, public format; the video analogue of [[WavCodec]]. `parse`
    * walks the big-endian box tree (size/type headers, 64-bit
    * largesize and run-to-end sizes handled, hostile lengths rejected
    * with the same Long-arithmetic bounds rule as the RIFF walker) and
    * extracts the movie header plus per-track headers: mvhd
    * timescale/duration, tkhd track id + 16.16 fixed-point dimensions,
    * mdhd media timescale, hdlr handler type ('vide'/'soun'). Both
    * FullBox versions (v0 32-bit, v1 64-bit times) parse. `encode`
    * writes minimal valid v0 files for fixtures. Sample DECODING
    * (H.264 etc.) stays behind the documented [[FakeCodec]] stub — no
    * video codec ships in this environment — but container metadata is
    * uncompressed structure, so this path is a complete real parse. */
  object Mp4Codec {
    final case class TrackInfo(trackId: Long, handler: String,
        timescale: Long, duration: Long, width: Int, height: Int)
    final case class Mp4Info(timescale: Long, duration: Long,
        tracks: List[TrackInfo])

    private def be16(b: Array[Byte], i: Int): Int =
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    private def be32(b: Array[Byte], i: Int): Long =
      ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
        ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
    private def be64(b: Array[Byte], i: Int): Long =
      (be32(b, i) << 32) | be32(b, i + 4)
    private def tag(b: Array[Byte], i: Int): String =
      new String(b, i, 4, "US-ASCII")

    /** Walk child boxes of [from, to); f(type, payloadStart, payloadEnd).
      * Returns false on a malformed header (hostile size fields). */
    private def walk(b: Array[Byte], from: Int, to: Int)(
        f: (String, Int, Int) => Unit): Boolean = {
      var i = from
      while (i + 8 <= to) {
        val size32 = be32(b, i)
        val typ = tag(b, i + 4)
        var payload = i + 8
        // size semantics per 14496-12 §4.2: 1 -> 64-bit largesize
        // follows the type; 0 -> box runs to the end of the enclosure
        val end: Long =
          if (size32 == 1L) {
            if (i + 16 > to) return false
            payload = i + 16
            i.toLong + be64(b, i + 8)
          } else if (size32 == 0L) to.toLong
          else i.toLong + size32
        if (end < payload || end > to) return false
        f(typ, payload, end.toInt)
        i = end.toInt
      }
      i == to // boxes must tile the range exactly — a trailing
              // partial header means truncation
    }

    /** FullBox header: returns (version, payloadAfterVerFlags). */
    @inline private def full(b: Array[Byte], s: Int): (Int, Int) =
      (b(s) & 0xff, s + 4)

    def parse(b: Array[Byte]): Option[Mp4Info] = {
      if (b.length < 16 || tag(b, 4) != "ftyp") return None
      var movie: Option[(Long, Long)] = None
      val tracks = List.newBuilder[TrackInfo]
      var bad = false // inner-walk truncation inside a well-sized parent
      def sub(from: Int, until: Int)(f: (String, Int, Int) => Unit): Unit =
        if (!walk(b, from, until)(f)) bad = true
      val ok = walk(b, 0, b.length) { (typ, s, e) =>
        if (typ == "moov") sub(s, e) { (t2, s2, e2) =>
          if (t2 == "mvhd" && e2 - s2 >= 20) {
            val (v, p) = full(b, s2)
            if (v != 1) movie = Some((be32(b, p + 8), be32(b, p + 12)))
            else if (e2 - s2 >= 32) movie = Some((be32(b, p + 16), be64(b, p + 20)))
          } else if (t2 == "trak") {
            var id = 0L; var w = 0; var h = 0
            var mts = 0L; var mdur = 0L; var handler = ""
            sub(s2, e2) { (t3, s3, e3) =>
              if (t3 == "tkhd") {
                val (v, p) = full(b, s3)
                // min payloads: v0 = 84, v1 = 96 (fixed layout to height)
                if (v != 1 && e3 - s3 >= 84) {
                  id = be32(b, p + 8); w = be16(b, p + 72); h = be16(b, p + 76)
                } else if (v == 1 && e3 - s3 >= 96) {
                  id = be32(b, p + 16); w = be16(b, p + 84); h = be16(b, p + 88)
                }
              } else if (t3 == "mdia") sub(s3, e3) { (t4, s4, e4) =>
                if (t4 == "mdhd" && e4 - s4 >= 20) {
                  val (v, p) = full(b, s4)
                  if (v != 1) { mts = be32(b, p + 8); mdur = be32(b, p + 12) }
                  else if (e4 - s4 >= 32) { mts = be32(b, p + 16); mdur = be64(b, p + 20) }
                } else if (t4 == "hdlr" && e4 - s4 >= 12) handler = tag(b, s4 + 8)
              }
            }
            tracks += TrackInfo(id, handler, mts, mdur, w, h)
          }
        }
      }
      if (!ok || bad) return None
      movie.map { case (ts, dur) => Mp4Info(ts, dur, tracks.result()) }
    }

    private def box(typ: String, parts: Array[Byte]*): Array[Byte] = {
      val len = 8 + parts.map(_.length).sum
      val out = java.nio.ByteBuffer.allocate(len)
      out.putInt(len).put(typ.getBytes("US-ASCII"))
      parts.foreach(out.put)
      out.array()
    }
    private def fullPayload(body: java.nio.ByteBuffer => Unit,
        size: Int): Array[Byte] = {
      val out = java.nio.ByteBuffer.allocate(size)
      out.putInt(0) // version 0, flags 0
      body(out)
      out.array()
    }

    /** Minimal valid v0 file: ftyp + moov(mvhd, trak(tkhd,
      * mdia(mdhd, hdlr))*) + mdat. */
    def encode(timescale: Long, duration: Long, tracks: Seq[TrackInfo],
        mdat: Array[Byte]): Array[Byte] = {
      val ftyp = box("ftyp", "isom".getBytes("US-ASCII"),
        Array[Byte](0, 0, 2, 0), "isomiso2".getBytes("US-ASCII"))
      val mvhd = box("mvhd", fullPayload({ o =>
        o.putInt(0).putInt(0) // creation, modification
        o.putInt(timescale.toInt).putInt(duration.toInt)
        o.putInt(0x00010000).putShort(0x0100.toShort).putShort(0) // rate, volume
        o.position(o.position() + 8) // reserved
        Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(o.putInt)
        o.position(o.position() + 24) // pre_defined
        o.putInt(tracks.size + 1)     // next_track_ID
      }, 100))
      val trakBoxes = tracks.map { t =>
        val tkhd = box("tkhd", fullPayload({ o =>
          o.putInt(0).putInt(0)
          o.putInt(t.trackId.toInt).putInt(0).putInt(t.duration.toInt)
          o.position(o.position() + 16) // reserved, layer, alt, volume, pad
          Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(o.putInt)
          o.putInt(t.width << 16).putInt(t.height << 16)
        }, 84))
        val mdhd = box("mdhd", fullPayload({ o =>
          o.putInt(0).putInt(0)
          o.putInt(t.timescale.toInt).putInt(t.duration.toInt)
          o.putShort(0x55c4.toShort).putShort(0) // language 'und'
        }, 24))
        val hdlr = box("hdlr", fullPayload({ o =>
          o.putInt(0).put(t.handler.getBytes("US-ASCII"))
          o.position(o.position() + 12)
          o.put(0.toByte) // empty name, null-terminated
        }, 25))
        box("trak", tkhd, box("mdia", mdhd, hdlr))
      }
      val moov = box("moov", (mvhd +: trakBoxes): _*)
      val md = box("mdat", mdat)
      ftyp ++ moov ++ md
    }

    /** One track's sample-layout tables (ISO 14496-12 §8.5-8.7): the
      * container math that locates every frame's bytes WITHOUT any
      * codec. */
    final case class SampleTable(trackId: Long,
        sizes: Array[Long],              // stsz, per sample
        chunkOffsets: Array[Long],       // stco/co64, absolute file offsets
        stsc: Array[(Long, Long)],       // (first_chunk 1-based, samples/chunk)
        sync: Option[Array[Long]],       // stss 1-based sample numbers; None = all sync
        stts: Array[(Long, Long)])       // (count, delta) runs

    /** Parse every track's sample tables plus the absolute offset of
      * the first mdat payload byte. Returns None on files without
      * sample tables (the metadata-only fixtures) — callers treat
      * that like a non-MP4. Hostile sizes reject via the same walk
      * guards as [[parse]]. */
    def parseSampleTables(b: Array[Byte]): Option[(Long, List[SampleTable])] = {
      if (b.length < 16 || tag(b, 4) != "ftyp") return None
      var mdatStart = -1L
      val tables = List.newBuilder[SampleTable]
      var bad = false
      var found = false
      def sub(from: Int, until: Int)(f: (String, Int, Int) => Unit): Unit =
        if (!walk(b, from, until)(f)) bad = true
      val ok = walk(b, 0, b.length) { (typ, s, e) =>
        if (typ == "mdat" && mdatStart < 0) mdatStart = s.toLong
        else if (typ == "moov") sub(s, e) { (t2, s2, e2) =>
          if (t2 == "trak") {
            var id = 0L
            var sizes: Array[Long] = null
            var offs: Array[Long] = null
            var stsc: Array[(Long, Long)] = null
            var sync: Option[Array[Long]] = None
            var stts: Array[(Long, Long)] = null
            sub(s2, e2) { (t3, s3, e3) =>
              if (t3 == "tkhd" && e3 - s3 >= 84) {
                val (v, p) = full(b, s3)
                id = if (v != 1) be32(b, p + 8)
                  else if (e3 - s3 >= 96) be32(b, p + 16) else id
              } else if (t3 == "mdia") sub(s3, e3) { (t4, s4, e4) =>
                if (t4 == "minf") sub(s4, e4) { (t5, s5, e5) =>
                  if (t5 == "stbl") sub(s5, e5) { (t6, s6, e6) =>
                    val (_, p) = full(b, s6)
                    def n(): Int = {
                      val c = be32(b, p)
                      if (c < 0 || p + 4 + c * 4 > e6) { bad = true; 0 }
                      else c.toInt
                    }
                    t6 match {
                      case "stsz" =>
                        val fixed = be32(b, p)
                        val cnt = be32(b, p + 4)
                        if (cnt < 0 || cnt > (1 << 24)) bad = true
                        else if (fixed != 0)
                          sizes = Array.fill(cnt.toInt)(fixed)
                        else if (p + 8 + cnt * 4 > e6) bad = true
                        else sizes = Array.tabulate(cnt.toInt)(i => be32(b, p + 8 + 4 * i))
                      case "stco" =>
                        val c = n()
                        offs = Array.tabulate(c)(i => be32(b, p + 4 + 4 * i))
                      case "co64" =>
                        val c = be32(b, p)
                        if (c < 0 || p + 4 + c * 8 > e6) bad = true
                        else offs = Array.tabulate(c.toInt)(i => be64(b, p + 4 + 8 * i))
                      case "stsc" =>
                        val c = be32(b, p)
                        if (c < 0 || p + 4 + c * 12 > e6) bad = true
                        else stsc = Array.tabulate(c.toInt)(i =>
                          (be32(b, p + 4 + 12 * i), be32(b, p + 8 + 12 * i)))
                      case "stss" =>
                        val c = n()
                        sync = Some(Array.tabulate(c)(i => be32(b, p + 4 + 4 * i)))
                      case "stts" =>
                        val c = be32(b, p)
                        if (c < 0 || p + 4 + c * 8 > e6) bad = true
                        else stts = Array.tabulate(c.toInt)(i =>
                          (be32(b, p + 4 + 8 * i), be32(b, p + 8 + 8 * i)))
                      case _ => ()
                    }
                  }
                }
              }
            }
            if (sizes != null && offs != null && stsc != null && stts != null) {
              found = true
              tables += SampleTable(id, sizes, offs, stsc, sync, stts)
            }
          }
        }
      }
      if (!ok || bad || !found || mdatStart < 0) None
      else Some((mdatStart, tables.result()))
    }

    /** Per-sample byte ranges + decode times + keyframe flags from one
      * track's tables: chunk membership from stsc runs, absolute
      * offset = chunk offset + within-chunk size prefix, dts from the
      * stts runs, keyframe from stss (absent = every sample). The
      * whole computation is container arithmetic — no codec. */
    def sampleRanges(t: SampleTable): Array[(Int, Long, Long, Long, Boolean)] = {
      val n = t.sizes.length
      val out = new Array[(Int, Long, Long, Long, Boolean)](n)
      val syncSet = t.sync.map(_.toSet)
      // expand stsc runs: entry k applies to chunks [first_k, first_{k+1})
      var sample = 0
      var chunk = 0
      var entry = 0
      var dtsRun = 0
      var dtsLeft = if (t.stts.nonEmpty) t.stts(0)._1 else 0L
      var dts = 0L
      while (sample < n && chunk < t.chunkOffsets.length) {
        while (entry + 1 < t.stsc.length && chunk + 1 >= t.stsc(entry + 1)._1) entry += 1
        val perChunk = t.stsc(entry)._2.toInt
        var within = 0
        var off = t.chunkOffsets(chunk)
        while (within < perChunk && sample < n) {
          val key = syncSet.forall(_.contains(sample + 1L))
          out(sample) = (sample, off, t.sizes(sample), dts, key)
          off += t.sizes(sample)
          // advance dts through the stts runs
          dts += (if (dtsRun < t.stts.length) t.stts(dtsRun)._2 else 0L)
          dtsLeft -= 1
          if (dtsLeft == 0 && dtsRun + 1 < t.stts.length) {
            dtsRun += 1; dtsLeft = t.stts(dtsRun)._1
          }
          sample += 1; within += 1
        }
        chunk += 1
      }
      if (sample != n) throw new IllegalArgumentException(
        s"MP4: sample tables inconsistent: placed $sample of $n samples")
      out
    }

    /** Encode a single-track fixture WITH real sample tables: samples
      * pack into chunks of `samplesPerChunk` (the last chunk takes the
      * remainder via a second stsc run when needed), every
      * `syncEvery`-th sample is a keyframe, constant stts delta. The
      * mdat payload is the concatenation of `sampleBytes`; stco holds
      * real absolute offsets (moov size is known before the offsets
      * are filled because table SIZES don't depend on their values). */
    def encodeWithSamples(timescale: Long, track: TrackInfo,
        sampleBytes: Array[Array[Byte]], samplesPerChunk: Int,
        delta: Long, syncEvery: Int): Array[Byte] = {
      require(samplesPerChunk > 0 && syncEvery > 0 && sampleBytes.nonEmpty)
      val n = sampleBytes.length
      val nChunks = (n + samplesPerChunk - 1) / samplesPerChunk
      val lastChunkSamples = n - (nChunks - 1) * samplesPerChunk
      def stblBoxes(chunkOffs: Array[Long]): Array[Byte] = {
        val stsd = box("stsd", fullPayload({ o =>
          o.putInt(1)
          o.putInt(16); o.put("rawv".getBytes("US-ASCII")); o.putInt(0); o.putInt(1)
        }, 24))
        val stts = box("stts", fullPayload({ o =>
          o.putInt(1); o.putInt(n); o.putInt(delta.toInt)
        }, 16))
        val stscEntries =
          if (lastChunkSamples == samplesPerChunk || nChunks == 1)
            Seq((1L, math.min(samplesPerChunk, n).toLong))
          else Seq((1L, samplesPerChunk.toLong), (nChunks.toLong, lastChunkSamples.toLong))
        val stsc = box("stsc", fullPayload({ o =>
          o.putInt(stscEntries.size)
          stscEntries.foreach { case (fc, spc) =>
            o.putInt(fc.toInt); o.putInt(spc.toInt); o.putInt(1)
          }
        }, 8 + 12 * stscEntries.size))
        val stsz = box("stsz", fullPayload({ o =>
          o.putInt(0); o.putInt(n)
          sampleBytes.foreach(s => o.putInt(s.length))
        }, 12 + 4 * n))
        val stco = box("stco", fullPayload({ o =>
          o.putInt(nChunks)
          chunkOffs.foreach(c => o.putInt(c.toInt))
        }, 8 + 4 * nChunks))
        val nSync = (n + syncEvery - 1) / syncEvery
        val stss = box("stss", fullPayload({ o =>
          o.putInt(nSync)
          (0 until nSync).foreach(k => o.putInt(1 + k * syncEvery))
        }, 8 + 4 * nSync))
        box("stbl", stsd, stts, stsc, stsz, stco, stss)
      }
      def build(chunkOffs: Array[Long]): Array[Byte] = {
        val ftyp = box("ftyp", "isom".getBytes("US-ASCII"),
          Array[Byte](0, 0, 2, 0), "isomiso2".getBytes("US-ASCII"))
        val dur = n * delta
        val mvhd = box("mvhd", fullPayload({ o =>
          o.putInt(0).putInt(0)
          o.putInt(timescale.toInt).putInt(dur.toInt)
          o.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
          o.position(o.position() + 8)
          Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(o.putInt)
          o.position(o.position() + 24)
          o.putInt(2)
        }, 100))
        val tkhd = box("tkhd", fullPayload({ o =>
          o.putInt(0).putInt(0)
          o.putInt(track.trackId.toInt).putInt(0).putInt(dur.toInt)
          o.position(o.position() + 16)
          Seq(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(o.putInt)
          o.putInt(track.width << 16).putInt(track.height << 16)
        }, 84))
        val mdhd = box("mdhd", fullPayload({ o =>
          o.putInt(0).putInt(0)
          o.putInt(track.timescale.toInt).putInt(dur.toInt)
          o.putShort(0x55c4.toShort).putShort(0)
        }, 24))
        val hdlr = box("hdlr", fullPayload({ o =>
          o.putInt(0).put(track.handler.getBytes("US-ASCII"))
          o.position(o.position() + 12)
          o.put(0.toByte)
        }, 25))
        val minf = box("minf", stblBoxes(chunkOffs))
        val moov = box("moov",
          mvhd, box("trak", tkhd, box("mdia", mdhd, hdlr, minf)))
        val md = box("mdat", sampleBytes.flatten.toArray)
        ftyp ++ moov ++ md
      }
      // pass 1 with zeroed offsets fixes the layout; pass 2 fills them
      val probe = build(new Array[Long](nChunks))
      val mdatPayload = probe.length - sampleBytes.map(_.length).sum
      val offs = new Array[Long](nChunks)
      var acc = mdatPayload.toLong
      var c = 0
      var s = 0
      while (c < nChunks) {
        offs(c) = acc
        val take = if (c == nChunks - 1) lastChunkSamples else samplesPerChunk
        var k = 0
        while (k < take) { acc += sampleBytes(s).length; s += 1; k += 1 }
        c += 1
      }
      build(offs)
    }
  }

  /** Container-metadata extraction for video payloads: parse each
    * payload's ISO BMFF box tree ([[Mp4Codec]]) and emit the movie
    * facts a pipeline partitions on before any frame decode — duration
    * (exact integer ms via duration*1000/timescale), track count,
    * video dimensions, audio-track presence. Non-MP4 payloads are
    * skipped. Narrow 1→1 mapPartitions over (id, bytes); all-integer
    * outputs so any engine reproduces them bit-for-bit. */
  def mp4Meta(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[
      (Long, Long, Long, Int, Int, Int, Boolean)]
    media.select("media_id", "bytes")
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        it.flatMap { r =>
          Mp4Codec.parse(r.getAs[Array[Byte]](1)).map { m =>
            val video = m.tracks.find(_.handler == "vide")
            (r.getLong(0), m.timescale,
              m.duration * 1000L / m.timescale, m.tracks.size,
              video.map(_.width).getOrElse(0),
              video.map(_.height).getOrElse(0),
              m.tracks.exists(_.handler == "soun"))
          }
        }
      }(enc)
      .toDF("media_id", "timescale", "duration_ms", "n_tracks",
        "width", "height", "has_audio")
  }

  /** Frame extraction WITHOUT decode: per-sample byte ranges, decode
    * times, and keyframe flags from each MP4 payload's sample tables
    * ([[Mp4Codec.parseSampleTables]] / [[Mp4Codec.sampleRanges]]) —
    * the container math a video pipeline uses to pull keyframes for
    * sampling or to hand codec-opaque byte slices to a GPU decoder,
    * with the codec itself never touched. Offsets are emitted RELATIVE
    * to the first mdat payload byte (offset - mdatStart), the quantity
    * that is a pure function of the sample layout (absolute offsets
    * also depend on box sizes). Payloads without sample tables (or
    * not MP4 at all) are skipped. 1→N mapPartitions, all-integer. */
  /** Keyframe payload EXTRACTION without decode — X186's sample
    * tables driven back into the actual bytes: for every stss-marked
    * sample, slice its exact payload out of the mdat by container
    * math alone (no codec) and emit per-keyframe evidence — size,
    * dts, first/last byte, and a position-weighted checksum that pins
    * every payload byte's value AND place. This is the "pull the
    * keyframes for sampling / hand them to a downstream decoder"
    * step of a video ingest; the slices stay inside the per-row map
    * (only the bounded stat rows shuffle — at 100 TB the mdat bytes
    * never leave their executor). */
  def mp4KeyframePayloads(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[
      (Long, Long, Long, Long, Long, Long, Long, Long)]
    media.select("media_id", "bytes")
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val b = r.getAs[Array[Byte]](1)
          Mp4Codec.parseSampleTables(b).toSeq.flatMap { case (_, tables) =>
            tables.flatMap { t =>
              Mp4Codec.sampleRanges(t).collect {
                case (i, off, sz, dts, true) =>
                  if (off < 0 || off + sz > b.length)
                    throw new IllegalArgumentException(
                      s"MP4: keyframe $i range [$off, +$sz) overruns ${b.length} bytes")
                  var ck = 0L
                  var k = 0
                  while (k < sz) {
                    ck += (k + 1).toLong * (b((off + k).toInt) & 0xff)
                    k += 1
                  }
                  (id, t.trackId, i.toLong, dts, sz,
                    (b(off.toInt) & 0xff).toLong,
                    (b((off + sz - 1).toInt) & 0xff).toLong, ck)
              }
            }
          }
        }
      }(enc)
      .toDF("media_id", "track_id", "sample_idx", "dts", "size",
        "first_byte", "last_byte", "checksum")
  }

  def mp4SampleRanges(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.product[
      (Long, Long, Long, Long, Long, Long, Boolean)]
    media.select("media_id", "bytes")
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          Mp4Codec.parseSampleTables(r.getAs[Array[Byte]](1)).toSeq
            .flatMap { case (mdatStart, tables) =>
              tables.flatMap { t =>
                Mp4Codec.sampleRanges(t).map { case (i, off, sz, dts, key) =>
                  (id, t.trackId, i.toLong, off - mdatStart, sz, dts, key)
                }
              }
            }
        }
      }(enc)
      .toDF("media_id", "track_id", "sample_idx", "offset_in_mdat",
        "size", "dts", "keyframe")
  }

  /** Bitrate TIMELINE from container math alone — the byte-budget
    * profile a video ingest reads before deciding what to keep
    * (rate spikes locate scene complexity; keyframe cadence bounds
    * seek granularity), computed like [[mp4SampleRanges]] without
    * ever touching the codec: samples bucket by `dts div windowTicks`
    * and each (track, window) reduces to sample/byte/keyframe counts.
    * All integer, exactly replayable; the mdat stays untouched — the
    * only rows emitted are the bounded per-window stats. */
  def mp4BitrateTimeline(media: DataFrame,
      windowTicks: Long = 1024L): DataFrame = {
    require(windowTicks > 0)
    val enc = org.apache.spark.sql.Encoders.product[
      (Long, Long, Long, Long, Long, Long)]
    media.select("media_id", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          Mp4Codec.parseSampleTables(r.getAs[Array[Byte]](1)).toSeq
            .flatMap { case (_, tables) =>
              tables.flatMap { t =>
                Mp4Codec.sampleRanges(t)
                  .groupBy { case (_, _, _, dts, _) => dts / windowTicks }
                  .toSeq.map { case (win, ss) =>
                    (id, t.trackId, win, ss.size.toLong,
                      ss.map(_._3).sum,
                      ss.count(_._5).toLong)
                  }
              }
            }
        }
      }(enc).toDF("media_id", "track_id", "window_idx", "n_samples",
        "n_bytes", "n_keyframes")
  }

  /** Real-decode audio windowing: parse each audio payload as WAV,
    * window the PCM samples (window/hop in samples), and emit exact
    * integer window statistics — count, energy (Σ s²) and peak (max
    * |s|), the framing+energy pass speech pipelines run before VAD.
    * Payloads that are not PCM WAV are skipped (compressed audio stays
    * behind the documented stub). Same 1→N mapPartitions generator
    * shape as [[segmentAudio]]; all-integer outputs so any engine
    * reproduces them bit-for-bit. */
  def wavSegmentStats(media: DataFrame, windowSamples: Int = 400,
      hopSamples: Int = 160): DataFrame = {
    require(windowSamples > 0 && hopSamples > 0)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    media.filter(col("kind") === "audio").select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          WavCodec.parse(bytes) match {
            case Some(info) if info.bitsPerSample == 16 =>
              val pcm = WavCodec.samples(bytes, info)
              pcm.indices.by(hopSamples).iterator.zipWithIndex.map { case (off, idx) =>
                val end = math.min(off + windowSamples, pcm.length)
                var energy = 0L
                var peak = 0L
                var i = off
                while (i < end) {
                  val s = pcm(i).toLong
                  energy += s * s
                  if (math.abs(s) > peak) peak = math.abs(s)
                  i += 1
                }
                (id, idx.toLong, (end - off).toLong, energy, peak)
              }
            case _ => Iterator.empty
          }
        }
      }(enc).toDF("media_id", "seg_idx", "n_samples", "energy", "peak")
  }

  /** [[wavSegmentStats]] for FLAC payloads: decode the compressed
    * stream with the from-scratch lossless codec
    * ([[graft.sources.Flac]]) and window the recovered PCM. Because
    * the codec is lossless, the stats are bit-identical to what the
    * raw samples produce — which is what lets a DuckDB oracle check a
    * COMPRESSED-audio pipeline end to end. Per-row decode inside
    * mapPartitions: embarrassingly parallel, no shuffle. */
  def flacSegmentStats(media: DataFrame, windowSamples: Int = 400,
      hopSamples: Int = 160): DataFrame = {
    require(windowSamples > 0 && hopSamples > 0)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    media.filter(col("kind") === "audio").select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val (_, chans) = graft.sources.Flac.decode(bytes)
          val pcm = chans(0)
          pcm.indices.by(hopSamples).iterator.zipWithIndex.map { case (off, idx) =>
            val end = math.min(off + windowSamples, pcm.length)
            var energy = 0L
            var peak = 0L
            var i = off
            while (i < end) {
              val s = pcm(i).toLong
              energy += s * s
              if (math.abs(s) > peak) peak = math.abs(s)
              i += 1
            }
            (id, idx.toLong, (end - off).toLong, energy, peak)
          }
        }
      }(enc).toDF("media_id", "seg_idx", "n_samples", "energy", "peak")
  }

  /** Audio windowing for audio-kind rows: overlapping fixed-length
    * sample windows (window/hop in samples — the 25 ms / 10 ms speech
    * framing shape; stub treats each byte as one sample). One window
    * per hop offset strictly inside the payload, the last window
    * truncated at the payload end — keyed (media_id, seg_idx), the
    * same 1->N generator shape as [[sampleFrames]] with stride
    * overlap. */
  def segmentAudio(media: DataFrame, windowSamples: Int = 400,
      hopSamples: Int = 160): DataFrame = {
    require(windowSamples > 0 && hopSamples > 0)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY)
    media.filter(col("kind") === "audio").select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val offsets = bytes.indices.by(hopSamples)
          offsets.iterator.zipWithIndex.map { case (off, idx) =>
            (id, idx, java.util.Arrays.copyOfRange(bytes, off,
              math.min(off + windowSamples, bytes.length)))
          }
        }
      }(enc).toDF("media_id", "seg_idx", "seg_bytes")
  }

  /** "Resize": renormalize the pseudo-pixel plane to a target cell
    * count by uniform re-striding (stub for a real resampler). */
  def resize(media: DataFrame, targetCells: Int): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    media.select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val stride = math.max(1, bytes.length / targetCells)
          val out = new Array[Byte](math.min(targetCells, bytes.length))
          var i = 0
          while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
          (id, out)
        }
      }(enc).toDF("media_id", "resized_bytes")
  }
}
