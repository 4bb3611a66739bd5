package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import graft.sources.Laz.{FullPoint, Point10}

/** LASzip compressor-1 ("pointwise", pre-2013) item codecs — the
  * version-1 variants of POINT10/GPSTIME11/RGB12/BYTE that original
  * laszip wrote before chunked compressor 2 existed. Old archives
  * still hold these files; the reference reads them transparently via
  * laspy+lazrs (pcsfc/point_processor.py:32).
  *
  * Structure per the published LASzip 1.x algorithm descriptions
  * (laszip.org format document and the LASzip paper; no code from any
  * LASzip implementation is used): the same k-bit integer corrector
  * as v2 ([[IntegerCompressor]]), but
  *  - coordinates code FIRST (x, then y, then z), predicted by the
  *    exact median of the last THREE x/y differences (v2 moved to
  *    per-return-context streaming median-of-5) with y/z contexts
  *    derived from the previous correctors' bit widths,
  *  - z is predicted from the previous z (v2 predicts from a
  *    per-return-level height table),
  *  - the attribute-changed mask follows the coordinates (v2 leads
  *    with it), gating per-previous-value byte models and integer
  *    correctors per field,
  *  - GPS time uses a SINGLE last-value state (v2 added the 4-slot
  *    rotation) with a 512-symbol multiplier model over the previous
  *    32-bit delta and a raw-64-bit escape,
  *  - RGB codes a 6-bit changed-bytes mask then each changed byte
  *    through one 8-bit corrector with the byte index as context (v2
  *    added inter-channel difference prediction),
  *  - BYTE items code each lane through one 8-bit corrector with the
  *    lane index as context.
  *
  * A compressor-1 file is ONE arithmetic stream — models never reset,
  * so the format is inherently unsplittable: the reader decodes a
  * file in a single task and parallelism comes from the file count
  * (unlike chunked v2, where the chunk table is the split index; at
  * 100 TB a directory of pre-2013 tiles still scans wide). Validation
  * boundary: as with every codec here, no second implementation
  * exists in-sandbox, so verification is roundtrip + spec-structure
  * conformance; fidelity notes are in README "Format boundary".
  */
private[sources] object LazV1 {

  /** Exact median of the last three inserted values (zero-initialized
    * — the v1 predictor's cold-start behavior), rotating insert. */
  private[sources] final class Median3 {
    private val v = new Array[Int](3)
    private var idx = 0
    def add(x: Int): Unit = { v(idx) = x; idx = (idx + 1) % 3 }
    def get: Int = {
      val (a, b, c) = (v(0), v(1), v(2))
      math.max(math.min(a, b), math.min(math.max(a, b), c))
    }
  }

  /** POINT10 version-1 codec: coords first (median-of-3 predicted,
    * k-chained contexts), then the changed mask and attributes. */
  private[sources] final class Point10V1Codec(first: Point10) {
    private val icDx = new IntegerCompressor(32, 1).initModels()
    private val icDy = new IntegerCompressor(32, 20).initModels()
    private val icZ = new IntegerCompressor(32, 20).initModels()
    private val mChanged = new ArithmeticModel(64).init()
    private val icIntensity = new IntegerCompressor(16, 1).initModels()
    private val icScanAngle = new IntegerCompressor(8, 2).initModels()
    private val icPointSource = new IntegerCompressor(16, 1).initModels()
    // per-previous-value byte models, created on first use
    private val mBitByte = new Array[ArithmeticModel](256)
    private val mClassification = new Array[ArithmeticModel](256)
    private val mUserData = new Array[ArithmeticModel](256)
    private val xDiffs = new Median3
    private val yDiffs = new Median3

    private var lx = first.x
    private var ly = first.y
    private var lz = first.z
    private var lIntensity = first.intensity
    private var lFlags = first.flags
    private var lCls = first.cls
    private var lScanAngle = first.scanAngle
    private var lUser = first.user
    private var lPsid = first.psid

    private def byteModel(arr: Array[ArithmeticModel], idx: Int): ArithmeticModel = {
      if (arr(idx) == null) arr(idx) = new ArithmeticModel(256).init()
      arr(idx)
    }

    def compress(enc: ArithmeticEncoder, p: Point10): Unit = {
      val dx = p.x - lx
      icDx.compress(enc, xDiffs.get, dx, 0)
      xDiffs.add(dx)
      val kx = icDx.lastK
      val dy = p.y - ly
      icDy.compress(enc, yDiffs.get, dy, if (kx < 19) kx else 19)
      yDiffs.add(dy)
      val kz = (kx + icDy.lastK) / 2
      icZ.compress(enc, lz, p.z, if (kz < 19) kz else 19)

      var changed = 0
      if (lFlags != p.flags) changed |= 32
      if (lIntensity != p.intensity) changed |= 16
      if (lCls != p.cls) changed |= 8
      if (lScanAngle != p.scanAngle) changed |= 4
      if (lUser != p.user) changed |= 2
      if (lPsid != p.psid) changed |= 1
      enc.encodeSymbol(mChanged, changed)
      if ((changed & 32) != 0) enc.encodeSymbol(byteModel(mBitByte, lFlags), p.flags)
      if ((changed & 16) != 0) icIntensity.compress(enc, lIntensity, p.intensity, 0)
      if ((changed & 8) != 0) enc.encodeSymbol(byteModel(mClassification, lCls), p.cls)
      if ((changed & 4) != 0)
        icScanAngle.compress(enc, lScanAngle, p.scanAngle, (p.flags >>> 6) & 1)
      if ((changed & 2) != 0) enc.encodeSymbol(byteModel(mUserData, lUser), p.user)
      if ((changed & 1) != 0) icPointSource.compress(enc, lPsid, p.psid, 0)

      lx = p.x; ly = p.y; lz = p.z; lIntensity = p.intensity
      lFlags = p.flags; lCls = p.cls; lScanAngle = p.scanAngle
      lUser = p.user; lPsid = p.psid
    }

    def decompress(dec: ArithmeticDecoder): Point10 = {
      val dx = icDx.decompress(dec, xDiffs.get, 0)
      val x = lx + dx
      xDiffs.add(dx)
      val kx = icDx.lastK
      val dy = icDy.decompress(dec, yDiffs.get, if (kx < 19) kx else 19)
      val y = ly + dy
      yDiffs.add(dy)
      val kz = (kx + icDy.lastK) / 2
      val z = icZ.decompress(dec, lz, if (kz < 19) kz else 19)

      val changed = dec.decodeSymbol(mChanged)
      val flags =
        if ((changed & 32) != 0) dec.decodeSymbol(byteModel(mBitByte, lFlags)) else lFlags
      val intensity =
        if ((changed & 16) != 0) icIntensity.decompress(dec, lIntensity, 0) else lIntensity
      val cls =
        if ((changed & 8) != 0) dec.decodeSymbol(byteModel(mClassification, lCls)) else lCls
      val scanAngle =
        if ((changed & 4) != 0)
          icScanAngle.decompress(dec, lScanAngle, (flags >>> 6) & 1)
        else lScanAngle
      val user =
        if ((changed & 2) != 0) dec.decodeSymbol(byteModel(mUserData, lUser)) else lUser
      val psid =
        if ((changed & 1) != 0) icPointSource.decompress(dec, lPsid, 0) else lPsid

      lx = x; ly = y; lz = z; lIntensity = intensity
      lFlags = flags; lCls = cls; lScanAngle = scanAngle
      lUser = user; lPsid = psid
      Point10(x, y, z, intensity, flags, cls, scanAngle, user, psid)
    }
  }

  private val GpsV1MultiMax = 512
  private val GpsV1SymSameDelta = 1 // diff repeats the established delta
  private val GpsV1SymIrregular = 0 // no multiplier fits; pred 0
  private val GpsV1SymHuge = GpsV1MultiMax - 2 // 510: raw 64-bit value
  private val GpsV1SymUnchanged = GpsV1MultiMax - 1 // 511: same time
  private val GpsV1MultiClamp = GpsV1MultiMax - 3 // 509: largest coded multi

  /** GPSTIME11 version-1 codec: single last-value state. Until a
    * 32-bit delta is established a 3-symbol model distinguishes
    * {same, new-delta, raw-64}; afterwards a 512-symbol multiplier
    * model codes each diff as multi x last-delta + corrector, with
    * 509 clamping large multipliers, 510 escaping to a raw 64-bit
    * value, 511 flagging an unchanged time, and an extreme-counter
    * re-anchoring the delta after repeated misfits. The decoder's
    * value reconstruction depends only on the coded symbols, so the
    * encoder's multiplier heuristic affects ratio, never losslessness. */
  private[sources] final class GpsTime11V1Codec(firstBits: Long) {
    private val m0Diff = new ArithmeticModel(3).init()
    private val mMulti = new ArithmeticModel(GpsV1MultiMax).init()
    private val icGps = new IntegerCompressor(32, 6).initModels()
    private var lastGps = firstBits
    private var lastDiff = 0
    private var extreme = 0

    private def multiContext(multi: Int): Int =
      if (multi == GpsV1SymSameDelta) 1
      else if (multi == GpsV1SymIrregular) 2
      else if (multi < 10) 3
      else if (multi < 50) 4
      else 5

    private def applyExtreme(diff: Int): Unit = {
      extreme += 1
      if (extreme > 3) { lastDiff = diff; extreme = 0 }
    }

    def compress(enc: ArithmeticEncoder, bits: Long): Unit = {
      if (lastDiff == 0) {
        if (bits == lastGps) { enc.encodeSymbol(m0Diff, 0); return }
        val diff64 = bits - lastGps
        if (diff64 == diff64.toInt.toLong) {
          enc.encodeSymbol(m0Diff, 1)
          icGps.compress(enc, 0, diff64.toInt, 0)
          lastDiff = diff64.toInt
          extreme = 0
          lastGps = bits
        } else {
          enc.encodeSymbol(m0Diff, 2)
          enc.writeBits(32, bits >>> 32)
          enc.writeBits(32, bits & 0xFFFFFFFFL)
          lastGps = bits
          lastDiff = 0
          extreme = 0
        }
      } else {
        if (bits == lastGps) { enc.encodeSymbol(mMulti, GpsV1SymUnchanged); return }
        val diff64 = bits - lastGps
        val diff = diff64.toInt
        if (diff64 == diff.toLong) {
          // multiplier of the established delta, clamped into the
          // codable range; out-of-range or negative fits fall to the
          // irregular symbol (pred 0) — exact either way
          val q = math.round(diff.toDouble / lastDiff.toDouble)
          val multi =
            if (q >= 2 && q <= GpsV1MultiClamp) q.toInt
            else if (q == 1) GpsV1SymSameDelta
            else GpsV1SymIrregular
          enc.encodeSymbol(mMulti, multi)
          if (multi == GpsV1SymSameDelta) {
            icGps.compress(enc, lastDiff, diff, 1)
            lastDiff = diff
            extreme = 0
          } else if (multi == GpsV1SymIrregular) {
            icGps.compress(enc, 0, diff, 2)
            applyExtreme(diff)
          } else {
            icGps.compress(enc, multi * lastDiff, diff, multiContext(multi))
            if (multi == GpsV1MultiClamp) applyExtreme(diff)
          }
          lastGps = bits
        } else {
          enc.encodeSymbol(mMulti, GpsV1SymHuge)
          enc.writeBits(32, bits >>> 32)
          enc.writeBits(32, bits & 0xFFFFFFFFL)
          lastGps = bits
          lastDiff = 0
          extreme = 0
        }
      }
    }

    def decompress(dec: ArithmeticDecoder): Long = {
      if (lastDiff == 0) {
        val sym = dec.decodeSymbol(m0Diff)
        if (sym == 0) lastGps
        else if (sym == 1) {
          val diff = icGps.decompress(dec, 0, 0)
          lastDiff = diff
          extreme = 0
          lastGps += diff
          lastGps
        } else {
          val bits = (dec.readBits(32) << 32) | dec.readBits(32)
          lastGps = bits
          lastDiff = 0
          extreme = 0
          bits
        }
      } else {
        val sym = dec.decodeSymbol(mMulti)
        if (sym == GpsV1SymUnchanged) lastGps
        else if (sym == GpsV1SymHuge) {
          val bits = (dec.readBits(32) << 32) | dec.readBits(32)
          lastGps = bits
          lastDiff = 0
          extreme = 0
          bits
        } else {
          val diff =
            if (sym == GpsV1SymSameDelta) {
              val d = icGps.decompress(dec, lastDiff, 1)
              lastDiff = d
              extreme = 0
              d
            } else if (sym == GpsV1SymIrregular) {
              val d = icGps.decompress(dec, 0, 2)
              applyExtreme(d)
              d
            } else {
              val d = icGps.decompress(dec, sym * lastDiff, multiContext(sym))
              if (sym == GpsV1MultiClamp) applyExtreme(d)
              d
            }
          lastGps += diff
          lastGps
        }
      }
    }
  }

  /** RGB12 version-1 codec: 6-bit changed-bytes mask, then each
    * changed byte through an 8-bit corrector with the byte index as
    * context (byte order r-lo, r-hi, g-lo, g-hi, b-lo, b-hi). */
  private[sources] final class Rgb12V1Codec(firstR: Int, firstG: Int, firstB: Int) {
    private val mByteUsed = new ArithmeticModel(64).init()
    private val icRgb = new IntegerCompressor(8, 6).initModels()
    private val last = Array(firstR & 0xFF, (firstR >>> 8) & 0xFF,
      firstG & 0xFF, (firstG >>> 8) & 0xFF, firstB & 0xFF, (firstB >>> 8) & 0xFF)

    def compress(enc: ArithmeticEncoder, r: Int, g: Int, b: Int): Unit = {
      val cur = Array(r & 0xFF, (r >>> 8) & 0xFF,
        g & 0xFF, (g >>> 8) & 0xFF, b & 0xFF, (b >>> 8) & 0xFF)
      var mask = 0
      var i = 0
      while (i < 6) { if (cur(i) != last(i)) mask |= 1 << i; i += 1 }
      enc.encodeSymbol(mByteUsed, mask)
      i = 0
      while (i < 6) {
        if ((mask & (1 << i)) != 0) {
          icRgb.compress(enc, last(i), cur(i), i)
          last(i) = cur(i)
        }
        i += 1
      }
    }

    def decompress(dec: ArithmeticDecoder): (Int, Int, Int) = {
      val mask = dec.decodeSymbol(mByteUsed)
      var i = 0
      while (i < 6) {
        if ((mask & (1 << i)) != 0) last(i) = icRgb.decompress(dec, last(i), i)
        i += 1
      }
      (last(0) | (last(1) << 8), last(2) | (last(3) << 8), last(4) | (last(5) << 8))
    }
  }

  /** BYTE version-1 codec: each extra-bytes lane through an 8-bit
    * corrector with the lane index as context. */
  private[sources] final class ByteV1Codec(first: Array[Byte]) {
    private val n = first.length
    private val icByte = new IntegerCompressor(8, n).initModels()
    private val last = Array.tabulate(n)(i => first(i) & 0xFF)

    def compress(enc: ArithmeticEncoder, cur: Array[Byte]): Unit = {
      var i = 0
      while (i < n) {
        val c = cur(i) & 0xFF
        icByte.compress(enc, last(i), c, i)
        last(i) = c
        i += 1
      }
    }

    def decompress(dec: ArithmeticDecoder): Array[Byte] = {
      val out = new Array[Byte](n)
      var i = 0
      while (i < n) {
        last(i) = icByte.decompress(dec, last(i), i)
        out(i) = last(i).toByte
        i += 1
      }
      out
    }
  }

  // --------------------------------------------------- whole-file stream

  /** Encode an entire compressor-1 point stream: first record raw,
    * then one arithmetic stream over ALL remaining points (models
    * never reset — that is what makes the format unsplittable). */
  private[sources] def encodeStream(format: Int, points: Array[FullPoint],
      extraLen: Int = 0): Array[Byte] = {
    require(points.nonEmpty, "empty LAZ v1 stream")
    val len = Laz.recordLen(format) + extraLen
    val raw = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    Laz.putFullPoint(raw, format, points(0), extraLen)
    if (points.length == 1) raw.array()
    else {
      val core = new Point10V1Codec(points(0).core)
      val gps = if (format == 1 || format == 3) new GpsTime11V1Codec(points(0).gps) else null
      val rgb = if (format == 2 || format == 3)
        new Rgb12V1Codec(points(0).r, points(0).g, points(0).b) else null
      val xb = if (extraLen > 0) new ByteV1Codec(points(0).extra) else null
      val enc = new ArithmeticEncoder
      var i = 1
      while (i < points.length) {
        val p = points(i)
        core.compress(enc, p.core)
        if (gps != null) gps.compress(enc, p.gps)
        if (rgb != null) rgb.compress(enc, p.r, p.g, p.b)
        if (xb != null) {
          require(p.extra != null && p.extra.length == extraLen,
            s"extra-bytes length mismatch at point $i")
          xb.compress(enc, p.extra)
        }
        i += 1
      }
      enc.done()
      val coded = enc.result()
      val out = new Array[Byte](len + coded.length)
      System.arraycopy(raw.array(), 0, out, 0, len)
      System.arraycopy(coded, 0, out, len, coded.length)
      out
    }
  }

  private[sources] def decodeStream(format: Int, bytes: Array[Byte], offset: Int,
      count: Int, extraLen: Int = 0): Array[FullPoint] = {
    val len = Laz.recordLen(format) + extraLen
    val out = new Array[FullPoint](count)
    val raw = ByteBuffer.wrap(bytes, offset, len).order(ByteOrder.LITTLE_ENDIAN)
    out(0) = Laz.getFullPoint(raw, format, extraLen)
    if (count > 1) {
      val core = new Point10V1Codec(out(0).core)
      val gps = if (format == 1 || format == 3) new GpsTime11V1Codec(out(0).gps) else null
      val rgb = if (format == 2 || format == 3)
        new Rgb12V1Codec(out(0).r, out(0).g, out(0).b) else null
      val xb = if (extraLen > 0) new ByteV1Codec(out(0).extra) else null
      val dec = new ArithmeticDecoder(bytes, offset + len, bytes.length).init()
      var i = 1
      while (i < count) {
        val c = core.decompress(dec)
        val g = if (gps != null) gps.decompress(dec) else 0L
        val (cr, cg, cb) = if (rgb != null) rgb.decompress(dec) else (0, 0, 0)
        val xa = if (xb != null) xb.decompress(dec) else null
        out(i) = FullPoint(c, g, cr, cg, cb, xa)
        i += 1
      }
    }
    out
  }
}
