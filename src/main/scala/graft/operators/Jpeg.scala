package graft.operators

/** REAL baseline JPEG pixel decode, pure JVM — the last still-image
  * format the corpus carries moves to the real-pixels side of the
  * multimodal boundary (GIF and PNG already decode for real;
  * reference scope note: the reference has no media decode at all,
  * this is beyond-reference surface).
  *
  * Scope is baseline sequential DCT (SOF0), 8-bit, 1 or 3 components,
  * sampling factors 1–2, restart markers honored; progressive (SOF2),
  * arithmetic coding, 12-bit, and hierarchical modes reject LOUDLY by
  * name. The arithmetic deliberately replicates the publicly-specified
  * fixed-point forms the IJG decoder family uses (and the JDK
  * bundles): the "slow-but-accurate" integer IDCT (Loeffler–
  * Ligtenberg–Moshytz factorization, CONST_BITS=13/PASS1_BITS=2
  * descaling), triangle-filter chroma upsampling for the 2x1/1x2/2x2
  * cases, and 16-bit fixed-point YCbCr→RGB — so decoded samples are
  * spec-checked BYTE-IDENTICAL against the JDK's own decoder on
  * JDK-encoded images (JpegCodecSpec), not merely "close".
  *
  * Exactness boundary (why the registered query uses DC-only
  * fixtures): the JPEG standard does not pin one IDCT rounding, so a
  * cross-ENGINE oracle over arbitrary JPEGs is impossible — but a
  * block whose AC coefficients are all zero decodes to the exact
  * integer `clamp(dcq·q0/8) + 128` in EVERY conforming decoder family
  * (both IDCT passes hit their exact DC shortcut), and with q0 = 8
  * the round-trip is exact integer arithmetic end to end. The
  * [[encodeJpegDcOnly]] fixture encoder exploits that: mm_jpeg_pixels
  * decodes REAL entropy-coded baseline JPEG bytes through the full
  * Huffman/marker machinery and still has a formula oracle.
  */
object JpegCodec {

  private def fail(off: Int, msg: String): Nothing =
    throw new IllegalArgumentException(s"JPEG: $msg (offset $off)")

  /** Coefficient index in natural (row-major) order for each zigzag
    * position — the public jpeg_natural_order constant. */
  private val naturalOrder: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman table in the spec's MINCODE/MAXCODE/VALPTR
    * decode form (ISO 10918-1 Annex F.2.2.3). */
  private final class Huff(counts: Array[Int], syms: Array[Int], off: Int) {
    private val mincode = new Array[Int](17)
    private val maxcode = new Array[Int](17)
    private val valptr = new Array[Int](17)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (counts(l - 1) == 0) maxcode(l) = -1
        else {
          valptr(l) = k
          mincode(l) = code
          code += counts(l - 1); k += counts(l - 1)
          maxcode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def decode(br: BitReader): Int = {
      var l = 1
      var code = br.nextBit()
      while (code > maxcode(l) || maxcode(l) == -1) {
        l += 1
        if (l > 16) fail(br.pos, "corrupt Huffman code (no symbol in 16 bits)")
        code = (code << 1) | br.nextBit()
      }
      syms(valptr(l) + code - mincode(l))
    }
    override def toString = s"Huff@$off"
  }

  /** MSB-first bit reader over the entropy-coded segment with 0xFF00
    * un-stuffing; restart markers are consumed explicitly by
    * [[restart]], never mid-symbol. */
  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var buf = 0
    private var cnt = 0
    def nextBit(): Int = {
      if (cnt == 0) {
        if (pos >= b.length) fail(pos, "entropy data truncated")
        val v = b(pos) & 0xff
        if (v == 0xff) {
          val nxt = if (pos + 1 < b.length) b(pos + 1) & 0xff else -1
          if (nxt != 0) fail(pos, f"marker 0xff$nxt%02x inside entropy data")
          pos += 2
        } else pos += 1
        buf = v; cnt = 8
      }
      cnt -= 1
      (buf >> cnt) & 1
    }
    def receive(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | nextBit(); i += 1 }
      v
    }
    /** Byte-align, require RSTn, resume after it. */
    def restart(expect: Int): Unit = {
      cnt = 0
      if (pos + 2 > b.length) fail(pos, "truncated at restart marker")
      val m = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)
      if (m != (0xffd0 | expect))
        fail(pos, f"expected RST$expect, found 0x$m%04x")
      pos += 2
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- integer IDCT (the public slow-but-accurate factorization) ----
  private final val ConstBits = 13
  private final val Pass1Bits = 2
  private final val F_0_298631336 = 2446
  private final val F_0_390180644 = 3196
  private final val F_0_541196100 = 4433
  private final val F_0_765366865 = 6270
  private final val F_0_899976223 = 7373
  private final val F_1_175875602 = 9633
  private final val F_1_501321110 = 12299
  private final val F_1_847759065 = 15137
  private final val F_1_961570560 = 16069
  private final val F_2_053119869 = 16819
  private final val F_2_562915447 = 20995
  private final val F_3_072711026 = 25172

  private def descale(x: Long, n: Int): Int =
    ((x + (1L << (n - 1))) >> n).toInt

  /** In: 64 dequantized coefficients (natural order). Out: 64 samples
    * in [0, 255] (level-shifted +128, clamped), natural order. */
  private[operators] def idct(coef: Array[Int]): Array[Int] = {
    val ws = new Array[Int](64)
    // pass 1: columns
    var c = 0
    while (c < 8) {
      if (coef(8 + c) == 0 && coef(16 + c) == 0 && coef(24 + c) == 0 &&
        coef(32 + c) == 0 && coef(40 + c) == 0 && coef(48 + c) == 0 &&
        coef(56 + c) == 0) {
        val dc = coef(c) << Pass1Bits
        var r = 0
        while (r < 8) { ws(8 * r + c) = dc; r += 1 }
      } else {
        val s0 = coef(c).toLong; val s1 = coef(8 + c).toLong
        val s2 = coef(16 + c).toLong; val s3 = coef(24 + c).toLong
        val s4 = coef(32 + c).toLong; val s5 = coef(40 + c).toLong
        val s6 = coef(48 + c).toLong; val s7 = coef(56 + c).toLong
        val z1e = (s2 + s6) * F_0_541196100
        val t2e = z1e - s6 * F_1_847759065
        val t3e = z1e + s2 * F_0_765366865
        val t0e = (s0 + s4) << ConstBits
        val t1e = (s0 - s4) << ConstBits
        val t10 = t0e + t3e; val t13 = t0e - t3e
        val t11 = t1e + t2e; val t12 = t1e - t2e
        var z1 = s7 + s1; var z2 = s5 + s3
        val z3 = (s7 + s3); val z4 = (s5 + s1)
        val z5 = (z3 + z4) * F_1_175875602
        var t0 = s7 * F_0_298631336
        var t1 = s5 * F_2_053119869
        var t2 = s3 * F_3_072711026
        var t3 = s1 * F_1_501321110
        z1 = -z1 * F_0_899976223
        z2 = -z2 * F_2_562915447
        val z3s = -z3 * F_1_961570560 + z5
        val z4s = -z4 * F_0_390180644 + z5
        t0 += z1 + z3s; t1 += z2 + z4s; t2 += z2 + z3s; t3 += z1 + z4s
        ws(c) = descale(t10 + t3, ConstBits - Pass1Bits)
        ws(56 + c) = descale(t10 - t3, ConstBits - Pass1Bits)
        ws(8 + c) = descale(t11 + t2, ConstBits - Pass1Bits)
        ws(48 + c) = descale(t11 - t2, ConstBits - Pass1Bits)
        ws(16 + c) = descale(t12 + t1, ConstBits - Pass1Bits)
        ws(40 + c) = descale(t12 - t1, ConstBits - Pass1Bits)
        ws(24 + c) = descale(t13 + t0, ConstBits - Pass1Bits)
        ws(32 + c) = descale(t13 - t0, ConstBits - Pass1Bits)
      }
      c += 1
    }
    // pass 2: rows, then level shift + clamp
    val out = new Array[Int](64)
    def clamp(v: Int): Int = {
      val s = v + 128
      if (s < 0) 0 else if (s > 255) 255 else s
    }
    var r = 0
    while (r < 8) {
      val o = 8 * r
      if (ws(o + 1) == 0 && ws(o + 2) == 0 && ws(o + 3) == 0 &&
        ws(o + 4) == 0 && ws(o + 5) == 0 && ws(o + 6) == 0 &&
        ws(o + 7) == 0) {
        val dc = clamp(descale(ws(o).toLong, Pass1Bits + 3))
        var i = 0
        while (i < 8) { out(o + i) = dc; i += 1 }
      } else {
        val s0 = ws(o).toLong; val s1 = ws(o + 1).toLong
        val s2 = ws(o + 2).toLong; val s3 = ws(o + 3).toLong
        val s4 = ws(o + 4).toLong; val s5 = ws(o + 5).toLong
        val s6 = ws(o + 6).toLong; val s7 = ws(o + 7).toLong
        val z1e = (s2 + s6) * F_0_541196100
        val t2e = z1e - s6 * F_1_847759065
        val t3e = z1e + s2 * F_0_765366865
        val t0e = (s0 + s4) << ConstBits
        val t1e = (s0 - s4) << ConstBits
        val t10 = t0e + t3e; val t13 = t0e - t3e
        val t11 = t1e + t2e; val t12 = t1e - t2e
        var z1 = s7 + s1; var z2 = s5 + s3
        val z3 = (s7 + s3); val z4 = (s5 + s1)
        val z5 = (z3 + z4) * F_1_175875602
        var t0 = s7 * F_0_298631336
        var t1 = s5 * F_2_053119869
        var t2 = s3 * F_3_072711026
        var t3 = s1 * F_1_501321110
        z1 = -z1 * F_0_899976223
        z2 = -z2 * F_2_562915447
        val z3s = -z3 * F_1_961570560 + z5
        val z4s = -z4 * F_0_390180644 + z5
        t0 += z1 + z3s; t1 += z2 + z4s; t2 += z2 + z3s; t3 += z1 + z4s
        val n = ConstBits + Pass1Bits + 3
        out(o) = clamp(descale(t10 + t3, n))
        out(o + 7) = clamp(descale(t10 - t3, n))
        out(o + 1) = clamp(descale(t11 + t2, n))
        out(o + 6) = clamp(descale(t11 - t2, n))
        out(o + 2) = clamp(descale(t12 + t1, n))
        out(o + 5) = clamp(descale(t12 - t1, n))
        out(o + 3) = clamp(descale(t13 + t0, n))
        out(o + 4) = clamp(descale(t13 - t0, n))
      }
      r += 1
    }
    out
  }

  // ---- fixed-point YCbCr -> RGB (SCALEBITS = 16) ----
  private def fix(x: Double): Long = (x * 65536.0 + 0.5).toLong
  private val crR = Array.tabulate(256)(i =>
    ((fix(1.40200) * (i - 128) + 32768) >> 16).toInt)
  private val cbB = Array.tabulate(256)(i =>
    ((fix(1.77200) * (i - 128) + 32768) >> 16).toInt)
  private val crG = Array.tabulate(256)(i => -fix(0.71414) * (i - 128))
  private val cbG = Array.tabulate(256)(i => -fix(0.34414) * (i - 128) + 32768)

  private def clamp8(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  /** (width, height, packed 0xRRGGBB row-major) — the [[Multimodal.PngCodec]]
    * return contract. */
  def decode(b: Array[Byte]): (Int, Int, Array[Int]) = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      fail(0, "bad SOI")
    def u16(i: Int): Int = {
      if (i + 2 > b.length) fail(i, "truncated")
      ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
    }
    val qt = new Array[Array[Int]](4)
    val dcTabs = new Array[Huff](4)
    val acTabs = new Array[Huff](4)
    var w = 0; var h = 0; var nComp = 0
    val compId = new Array[Int](3); val compH = new Array[Int](3)
    val compV = new Array[Int](3); val compQ = new Array[Int](3)
    var restartInt = 0
    var sofSeen = false
    var p = 2
    var pixels: (Int, Int, Array[Int]) = null

    def parseSof(seg: Int, len: Int): Unit = {
      if (sofSeen) fail(seg, "multiple SOF markers")
      sofSeen = true
      if ((b(seg) & 0xff) != 8) fail(seg, s"precision ${b(seg) & 0xff} (contract: 8)")
      h = u16(seg + 1); w = u16(seg + 3)
      if (w <= 0 || h <= 0) fail(seg, s"degenerate dims ${w}x$h")
      if (w.toLong * h > (1L << 26)) fail(seg, s"dims ${w}x$h over decode budget")
      nComp = b(seg + 5) & 0xff
      if (nComp != 1 && nComp != 3) fail(seg + 5, s"$nComp components (contract: 1 or 3)")
      if (len != 8 + 3 * nComp) fail(seg, s"SOF length $len")
      var i = 0
      while (i < nComp) {
        val o = seg + 6 + 3 * i
        compId(i) = b(o) & 0xff
        compH(i) = (b(o + 1) & 0xff) >> 4
        compV(i) = b(o + 1) & 0x0f
        compQ(i) = b(o + 2) & 0xff
        if (compH(i) < 1 || compH(i) > 2 || compV(i) < 1 || compV(i) > 2)
          fail(o + 1, s"sampling ${compH(i)}x${compV(i)} (contract: 1-2)")
        if (compQ(i) > 3) fail(o + 2, s"quant table id ${compQ(i)}")
        i += 1
      }
      if (nComp == 1 && (compH(0) != 1 || compV(0) != 1))
        fail(seg + 6, "grayscale with subsampling")
    }

    def decodeScan(seg: Int, len: Int): Int = {
      val ns = b(seg) & 0xff
      if (ns != nComp) fail(seg, s"scan has $ns of $nComp components (contract: one interleaved scan)")
      if (len != 6 + 2 * ns) fail(seg, s"SOS length $len (expected ${6 + 2 * ns} for $ns components)")
      val scanDc = new Array[Huff](3); val scanAc = new Array[Huff](3)
      var i = 0
      while (i < ns) {
        val o = seg + 1 + 2 * i
        val cs = b(o) & 0xff
        val ci = compId.indexOf(cs)
        if (ci < 0 || ci >= nComp) fail(o, s"scan component $cs not in frame")
        val td = (b(o + 1) & 0xff) >> 4; val ta = b(o + 1) & 0x0f
        if (td > 3 || ta > 3) fail(o + 1, "table id out of range")
        scanDc(ci) = dcTabs(td); scanAc(ci) = acTabs(ta)
        if (scanDc(ci) == null || scanAc(ci) == null)
          fail(o + 1, s"scan references undefined Huffman table dc=$td ac=$ta")
        i += 1
      }
      val ss = b(seg + 1 + 2 * ns) & 0xff
      val se = b(seg + 2 + 2 * ns) & 0xff
      val ahAl = b(seg + 3 + 2 * ns) & 0xff
      if (ss != 0 || se != 63 || ahAl != 0)
        fail(seg + 1 + 2 * ns, s"spectral selection $ss..$se/$ahAl (baseline contract)")
      val hmax = (0 until nComp).map(compH).max
      val vmax = (0 until nComp).map(compV).max
      val mcux = (w + 8 * hmax - 1) / (8 * hmax)
      val mcuy = (h + 8 * vmax - 1) / (8 * vmax)
      // per-component padded planes at SAMPLED resolution
      val planeW = Array.tabulate(nComp)(i => mcux * compH(i) * 8)
      val planeH = Array.tabulate(nComp)(i => mcuy * compV(i) * 8)
      val planes = Array.tabulate(nComp)(i => new Array[Int](planeW(i) * planeH(i)))
      val quant = Array.tabulate(nComp) { i =>
        val q = qt(compQ(i))
        if (q == null) fail(seg, s"component $i references undefined quant table ${compQ(i)}")
        q
      }
      val br = new BitReader(b, seg + 4 + 2 * ns)
      val pred = new Array[Int](nComp)
      val coef = new Array[Int](64)
      var mcu = 0
      var rstIdx = 0
      val nMcu = mcux * mcuy
      while (mcu < nMcu) {
        if (restartInt > 0 && mcu > 0 && mcu % restartInt == 0) {
          br.restart(rstIdx)
          rstIdx = (rstIdx + 1) & 7
          java.util.Arrays.fill(pred, 0)
        }
        val my = mcu / mcux; val mx = mcu % mcux
        var ci = 0
        while (ci < nComp) {
          var by = 0
          while (by < compV(ci)) {
            var bx = 0
            while (bx < compH(ci)) {
              java.util.Arrays.fill(coef, 0)
              // DC
              val t = scanDc(ci).decode(br)
              if (t > 11) fail(br.pos, s"DC category $t")
              pred(ci) += extend(br.receive(t), t)
              coef(0) = pred(ci) * quant(ci)(0)
              // AC run-length
              var k = 1
              var eob = false
              while (k < 64 && !eob) {
                val rs = scanAc(ci).decode(br)
                val run = rs >> 4; val size = rs & 15
                if (size == 0) {
                  if (run == 15) k += 16 else eob = true
                } else {
                  k += run
                  if (k > 63) fail(br.pos, "AC run past block end")
                  coef(naturalOrder(k)) =
                    extend(br.receive(size), size) * quant(ci)(k)
                  k += 1
                }
              }
              val px = idct(coef)
              val ox = (mx * compH(ci) + bx) * 8
              val oy = (my * compV(ci) + by) * 8
              var r = 0
              while (r < 8) {
                var cc = 0
                val dst = (oy + r) * planeW(ci) + ox
                while (cc < 8) { planes(ci)(dst + cc) = px(8 * r + cc); cc += 1 }
                r += 1
              }
              bx += 1
            }
            by += 1
          }
          ci += 1
        }
        mcu += 1
      }
      // upsample chroma to full padded resolution, convert, crop.
      // Edge duplication happens at the DOWNSAMPLED VALID dims
      // (ceil(w*h_i/hmax) x ceil(h*v_i/vmax)) like the reference
      // decoder family, NOT at the padded plane edge — the padded
      // tail holds real decoded samples of the encoder's pad blocks,
      // which must not bleed into the last visible column/row.
      val fullW = mcux * hmax * 8; val fullH = mcuy * vmax * 8
      val up = Array.tabulate(nComp) { i =>
        val vw = (w * compH(i) + hmax - 1) / hmax
        val vh = (h * compV(i) + vmax - 1) / vmax
        upsample(planes(i), planeW(i),
          hmax / compH(i), vmax / compV(i), fullW, vw, vh)
      }
      val out = new Array[Int](w * h)
      if (nComp == 1) {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = up(0)(y * fullW + x)
            out(y * w + x) = (g << 16) | (g << 8) | g
            x += 1
          }
          y += 1
        }
      } else {
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val o = y * fullW + x
            val yy = up(0)(o); val cb = up(1)(o); val cr = up(2)(o)
            val r = clamp8(yy + crR(cr))
            val g = clamp8(yy + ((cbG(cb) + crG(cr)) >> 16).toInt)
            val bl = clamp8(yy + cbB(cb))
            out(y * w + x) = (r << 16) | (g << 8) | bl
            x += 1
          }
          y += 1
        }
      }
      pixels = (w, h, out)
      // skip any pad bits; caller resumes marker scan at br.pos
      br.pos
    }

    var done = false
    while (!done) {
      if (p + 2 > b.length) fail(p, "ran off end before EOI")
      if ((b(p) & 0xff) != 0xff) fail(p, f"expected marker, got 0x${b(p) & 0xff}%02x")
      val m = b(p + 1) & 0xff
      if (m == 0xff) { p += 1 } // fill byte
      else if (m == 0xd9) { done = true } // EOI
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { p += 2 } // standalone
      else {
        val len = u16(p + 2)
        if (len < 2 || p + 2 + len > b.length)
          fail(p + 2, s"segment length $len overruns ${b.length} bytes")
        val seg = p + 4
        val segLen = len - 2
        m match {
          case 0xc0 => parseSof(seg, len)
          case 0xc4 => // DHT: one or more tables
            var o = seg
            while (o < seg + segLen) {
              val tcTh = b(o) & 0xff
              val tc = tcTh >> 4; val th = tcTh & 15
              if (tc > 1 || th > 3) fail(o, s"DHT class/id $tc/$th")
              if (o + 17 > seg + segLen) fail(o, "DHT truncated")
              val counts = Array.tabulate(16)(i => b(o + 1 + i) & 0xff)
              val n = counts.sum
              if (n > 256 || o + 17 + n > seg + segLen) fail(o, s"DHT symbol count $n")
              val syms = Array.tabulate(n)(i => b(o + 17 + i) & 0xff)
              val tab = new Huff(counts, syms, o)
              if (tc == 0) dcTabs(th) = tab else acTabs(th) = tab
              o += 17 + n
            }
          case 0xdb => // DQT: one or more tables
            var o = seg
            while (o < seg + segLen) {
              val pqTq = b(o) & 0xff
              val pq = pqTq >> 4; val tq = pqTq & 15
              if (pq != 0) fail(o, "16-bit quant table (contract: 8-bit)")
              if (tq > 3) fail(o, s"DQT id $tq")
              if (o + 65 > seg + segLen) fail(o, "DQT truncated")
              qt(tq) = Array.tabulate(64)(i => b(o + 1 + i) & 0xff)
              if (qt(tq).exists(_ == 0)) fail(o, "zero quant value")
              o += 65
            }
          case 0xdd =>
            if (len != 4) fail(p, s"DRI length $len")
            restartInt = u16(seg)
          case 0xda =>
            if (!sofSeen) fail(p, "SOS before SOF")
            if (pixels != null) fail(p, "second scan (contract: one)")
            p = decodeScan(seg, len)
            // after the entropy data the stream continues with markers
            // (RST handled inside; EOI/next marker here)
            if (p + 2 > b.length) fail(p, "no EOI after scan")
            // fall through to marker loop WITHOUT advancing past a segment
            m match { case _ => () }
          case 0xc2 => fail(p, "progressive DCT (SOF2) out of contract")
          case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca | 0xcb |
              0xcd | 0xce | 0xcf =>
            fail(p, f"SOF 0x$m%02x not baseline sequential")
          case 0xc8 | 0xde | 0xdf => fail(p, f"hierarchical marker 0x$m%02x")
          case app if app >= 0xe0 && app <= 0xef => () // APPn metadata
          case 0xfe => () // comment
          case other => fail(p, f"unexpected marker 0x$other%02x")
        }
        if (m != 0xda) p += 2 + len
      }
    }
    if (pixels == null) fail(p, "no scan data before EOI")
    pixels
  }

  /** Upsample one component plane by (sx, sy) in {1,2} to the full
    * padded grid, filtering only the VALID vw x vh downsampled region
    * (edges duplicate at vw-1 / vh-1). All three 2x directions use the
    * triangle filter (3/4 nearer + 1/4 further, the IJG/turbo "fancy"
    * weights): h2v1 column biases (+1 even / +2 odd), h1v2 row biases
    * (+1 toward-above / +2 toward-below), h2v2 as the separable
    * vertical-then-horizontal >> 4 form — matching the decoder
    * family's selection rule so spec cross-checks stay byte-exact. */
  private def upsample(in: Array[Int], iw: Int, sx: Int, sy: Int,
      ow: Int, vw: Int, vh: Int): Array[Int] = {
    if (sx == 1 && sy == 1) return in
    val out = new Array[Int](ow * (2 * vh max vh))
    if (sx == 2 && sy == 1) {
      var y = 0
      while (y < vh) {
        val ir = y * iw
        val or = y * ow
        var x = 0
        while (x < vw) {
          val v3 = in(ir + x) * 3
          out(or + 2 * x) =
            if (x == 0) in(ir) else (v3 + in(ir + x - 1) + 1) >> 2
          out(or + 2 * x + 1) =
            if (x == vw - 1) in(ir + x) else (v3 + in(ir + x + 1) + 2) >> 2
          x += 1
        }
        y += 1
      }
    } else if (sx == 1 && sy == 2) {
      var oy = 0
      while (oy < 2 * vh) {
        val iy = oy >> 1
        val even = (oy & 1) == 0
        val ny = if (even) math.max(iy - 1, 0) else math.min(iy + 1, vh - 1)
        val bias = if (even) 1 else 2
        val tr = iy * iw; val nr = ny * iw
        val or = oy * ow
        var x = 0
        while (x < vw) {
          out(or + x) = (in(tr + x) * 3 + in(nr + x) + bias) >> 2
          x += 1
        }
        oy += 1
      }
    } else if (sx == 2 && sy == 2) {
      // vertical triangle (3*this + next-nearest row) into column
      // sums, then horizontal triangle over the 4x-scaled sums
      var oy = 0
      while (oy < 2 * vh) {
        val iy = oy >> 1
        val ny = if ((oy & 1) == 0) math.max(iy - 1, 0)
          else math.min(iy + 1, vh - 1)
        val tr = iy * iw; val nr = ny * iw
        val or = oy * ow
        var x = 0
        var last = 0
        var cur = in(tr) * 3 + in(nr)
        while (x < vw) {
          val next = if (x < vw - 1) in(tr + x + 1) * 3 + in(nr + x + 1) else 0
          out(or + 2 * x) =
            if (x == 0) (cur * 4 + 8) >> 4 else (cur * 3 + last + 8) >> 4
          out(or + 2 * x + 1) =
            if (x == vw - 1) (cur * 4 + 7) >> 4 else (cur * 3 + next + 7) >> 4
          last = cur; cur = next
          x += 1
        }
        oy += 1
      }
    } else fail(0, s"upsample factors ${sx}x$sy out of contract")
    out
  }

  /** Strip metadata segments — every APPn (0xFFE0-0xFFEF: JFIF, EXIF,
    * ICC, XMP, ...) and COM (0xFFFE) — from a baseline JPEG without
    * touching the image data: the privacy scrub a training-data
    * pipeline runs before anything else (EXIF carries GPS and serial
    * numbers), as a pure marker walk with NO decode. Everything else
    * copies verbatim (tables, frame, the whole entropy-coded scan),
    * so the stripped file decodes bit-identically; idempotent.
    * Returns (strippedBytes, segmentsRemoved). Structural errors
    * reject loudly with offsets like [[decode]]. */
  def stripMetadata(b: Array[Byte]): (Array[Byte], Int) = {
    if (b.length < 4 || (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8)
      fail(0, "bad SOI")
    val out = new java.io.ByteArrayOutputStream(b.length)
    out.write(0xff); out.write(0xd8)
    var removed = 0
    var p = 2
    var done = false
    while (!done) {
      if (p + 2 > b.length) fail(p, "ran off end before EOI")
      if ((b(p) & 0xff) != 0xff) fail(p, f"expected marker, got 0x${b(p) & 0xff}%02x")
      val m = b(p + 1) & 0xff
      if (m == 0xff) { out.write(0xff); p += 1 } // fill byte
      else if (m == 0xd9) { out.write(0xff); out.write(0xd9); done = true }
      else if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) {
        out.write(0xff); out.write(m); p += 2
      } else {
        if (p + 4 > b.length) fail(p, "truncated segment header")
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length)
          fail(p + 2, s"segment length $len overruns ${b.length} bytes")
        val isMeta = (m >= 0xe0 && m <= 0xef) || m == 0xfe
        if (isMeta) removed += 1
        else out.write(b, p, 2 + len)
        p += 2 + len
        if (m == 0xda) {
          // entropy-coded data follows: copy through to the next true
          // marker (RSTn and stuffed 0xFF00 stay inside the scan)
          val start = p
          var q = p
          var inScan = true
          while (inScan) {
            if (q + 2 > b.length) fail(q, "scan data truncated before EOI")
            if ((b(q) & 0xff) == 0xff) {
              val n = b(q + 1) & 0xff
              if (n == 0x00 || (n >= 0xd0 && n <= 0xd7)) q += 2
              else inScan = false
            } else q += 1
          }
          out.write(b, start, q - start)
          p = q
        }
      }
    }
    (out.toByteArray, removed)
  }

  // ---- DC-only fixture encoder (exact-oracle path) ----

  /** Encode a REAL baseline grayscale JPEG whose blocks are constant:
    * block (bx, by) holds `blockVal(bx, by)` in [0, 255] at every
    * pixel. All AC coefficients are zero and q0 = 8, so EVERY
    * conforming decoder reproduces the block values exactly (both
    * IDCT passes hit their integer DC shortcut: (32f+16)>>5 = f) —
    * which is what gives mm_jpeg_pixels a formula oracle over real
    * entropy-coded bytes. Tables are minimal self-authored canonical
    * Huffman codes (9 four-bit DC category codes, a one-bit AC EOB). */
  def encodeJpegDcOnly(w: Int, h: Int, blockVal: (Int, Int) => Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"fixture dims ${w}x$h")
    require(restartInterval >= 0, s"restart interval $restartInterval")
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8) // SOI
    marker(0xdb); u16(2 + 65); u8(0x00) // DQT table 0, 8-bit
    (0 until 64).foreach(_ => u8(8))
    marker(0xc0); u16(8 + 3); u8(8); u16(h); u16(w); u8(1) // SOF0 gray
    u8(1); u8(0x11); u8(0)
    // DHT DC0: categories 0..8, all length 4 (canonical 0000..1000)
    marker(0xc4); u16(2 + 17 + 9); u8(0x00)
    val dcCounts = Array(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcCounts.foreach(u8); (0 until 9).foreach(u8)
    // DHT AC0: single symbol 0x00 (EOB) at length 1 (code "0")
    marker(0xc4); u16(2 + 17 + 1); u8(0x10)
    val acCounts = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acCounts.foreach(u8); u8(0x00)
    if (restartInterval > 0) { marker(0xdd); u16(4); u16(restartInterval) }
    marker(0xda); u16(6 + 2); u8(1); u8(1); u8(0x00) // SOS
    u8(0); u8(63); u8(0)
    // entropy data: per block, 4-bit DC category + category bits + EOB
    var acc = 0; var nb = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nb += 1
        if (nb == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00) // byte stuffing
          acc = 0; nb = 0
        }
        i -= 1
      }
    }
    def padToByte(): Unit =
      if (nb > 0) { // pad with 1s
        acc = (acc << (8 - nb)) | ((1 << (8 - nb)) - 1)
        bos.write(acc)
        if (acc == 0xff) bos.write(0x00)
        acc = 0; nb = 0
      }
    val bw = (w + 7) / 8; val bh = (h + 7) / 8
    var pred = 0
    var mcu = 0; var rstIdx = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          padToByte()
          marker(0xd0 | rstIdx)
          rstIdx = (rstIdx + 1) & 7
          pred = 0
        }
        val s = blockVal(bx, by)
        require(s >= 0 && s <= 255, s"block value $s")
        val f = s - 128
        val diff = f - pred
        pred = f
        val mag = math.abs(diff)
        var t = 0
        while ((mag >> t) != 0) t += 1
        require(t <= 8, s"DC category $t")
        putBits(t, 4) // DC category code (canonical: value == code)
        if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        putBits(0, 1) // AC EOB (code "0")
        mcu += 1
        bx += 1
      }
      by += 1
    }
    padToByte()
    marker(0xd9) // EOI
    bos.toByteArray
  }

  /** Color (YCbCr) DC-only fixture with luma sampling factors (sh, sv)
    * in {1,2} and 1x1 chroma — i.e. sh=sv=2 is 4:2:0, sh=2/sv=1 is
    * 4:2:2. Per MCU the interleaved order is the spec's: the sh×sv
    * luma blocks in raster order, then one Cb block, then one Cr
    * block; `yVal(bx, by)` indexes LUMA block coordinates, `cbVal` /
    * `crVal` index CHROMA (= MCU) block coordinates. Same minimal
    * canonical tables as the grayscale fixture, shared by all three
    * components. The sampled PLANES decode exactly (DC shortcut), but
    * the pixel output then flows through the triangle upsample and
    * fixed-point color convert — which is the point: it makes the
    * subsampled reconstruction paths cross-checkable byte-for-byte
    * against an independent conforming decoder (JpegCodecSpec does so
    * vs the JDK's) on bytes whose plane content is known exactly. */
  def encodeJpegDcOnlyColor(w: Int, h: Int, sh: Int, sv: Int,
      yVal: (Int, Int) => Int, cbVal: (Int, Int) => Int,
      crVal: (Int, Int) => Int): Array[Byte] = {
    require(w > 0 && h > 0 && w <= 4096 && h <= 4096, s"fixture dims ${w}x$h")
    require(sh >= 1 && sh <= 2 && sv >= 1 && sv <= 2, s"sampling ${sh}x$sv")
    val bos = new java.io.ByteArrayOutputStream()
    def u8(v: Int): Unit = bos.write(v & 0xff)
    def u16(v: Int): Unit = { u8(v >> 8); u8(v) }
    def marker(m: Int): Unit = { u8(0xff); u8(m) }
    marker(0xd8)
    marker(0xdb); u16(2 + 65); u8(0x00)
    (0 until 64).foreach(_ => u8(8))
    marker(0xc0); u16(8 + 9); u8(8); u16(h); u16(w); u8(3) // SOF0 color
    u8(1); u8((sh << 4) | sv); u8(0) // Y
    u8(2); u8(0x11); u8(0)           // Cb
    u8(3); u8(0x11); u8(0)           // Cr
    marker(0xc4); u16(2 + 17 + 9); u8(0x00)
    val dcCounts = Array(0, 0, 0, 9, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    dcCounts.foreach(u8); (0 until 9).foreach(u8)
    marker(0xc4); u16(2 + 17 + 1); u8(0x10)
    val acCounts = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    acCounts.foreach(u8); u8(0x00)
    marker(0xda); u16(6 + 6); u8(3) // SOS, 3 components
    u8(1); u8(0x00); u8(2); u8(0x00); u8(3); u8(0x00)
    u8(0); u8(63); u8(0)
    var acc = 0; var nb = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1); nb += 1
        if (nb == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; nb = 0
        }
        i -= 1
      }
    }
    val preds = new Array[Int](3)
    def putBlock(ci: Int, s: Int): Unit = {
      require(s >= 0 && s <= 255, s"block value $s")
      val f = s - 128
      val diff = f - preds(ci)
      preds(ci) = f
      val mag = math.abs(diff)
      var t = 0
      while ((mag >> t) != 0) t += 1
      putBits(t, 4)
      if (t > 0) putBits(if (diff < 0) diff + (1 << t) - 1 else diff, t)
      putBits(0, 1)
    }
    val mcux = (w + 8 * sh - 1) / (8 * sh)
    val mcuy = (h + 8 * sv - 1) / (8 * sv)
    var my = 0
    while (my < mcuy) {
      var mx = 0
      while (mx < mcux) {
        var by = 0
        while (by < sv) {
          var bx = 0
          while (bx < sh) {
            putBlock(0, yVal(mx * sh + bx, my * sv + by))
            bx += 1
          }
          by += 1
        }
        putBlock(1, cbVal(mx, my))
        putBlock(2, crVal(mx, my))
        mx += 1
      }
      my += 1
    }
    if (nb > 0) {
      acc = (acc << (8 - nb)) | ((1 << (8 - nb)) - 1)
      bos.write(acc)
      if (acc == 0xff) bos.write(0x00)
    }
    marker(0xd9)
    bos.toByteArray
  }
}
