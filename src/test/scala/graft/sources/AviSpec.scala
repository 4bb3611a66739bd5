package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class AviSpec extends AnyFunSuite {

  private def jpeg(w: Int, h: Int, seed: Int): Array[Byte] =
    graft.operators.JpegCodec.encodeJpegDcOnly(w, h,
      (bx, by) => (seed + bx * 7 + by * 13) % 256)

  test("encode -> parse round-trips header fields and frame bytes") {
    val frames = (0 until 3).map(t => jpeg(16, 24, 40 + t * 11))
    val avi = Avi.encodeMjpeg(16, 24, 40000, frames)
    val got = Avi.parseMjpeg(avi)
    assert(got.width == 16 && got.height == 24 && got.usPerFrame == 40000)
    assert(got.frames.length == 3)
    got.frames.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("odd-length frames pad to even chunk boundaries and still round-trip") {
    // DC-only JPEGs of varying content hit odd byte lengths routinely;
    // force both parities across several frames
    val frames = (0 until 5).map(t => jpeg(8 + 8 * (t % 2), 8, t * 37))
    val lens = frames.map(_.length % 2).toSet
    assert(lens.size == 2, s"fixture should cover both parities, got $lens")
    val got = Avi.parseMjpeg(Avi.encodeMjpeg(16, 8, 1000, frames))
    // frames come back as the stored bytes regardless of parity
    got.frames.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b))
    }
  }

  test("decoded fixture pixels equal the block formula exactly") {
    val avi = Avi.encodeMjpeg(16, 16, 33000,
      Seq(jpeg(16, 16, 5), jpeg(16, 16, 77)))
    val got = Avi.parseMjpeg(avi)
    got.frames.zipWithIndex.foreach { case (f, t) =>
      val seed = if (t == 0) 5 else 77
      val (w, h, px) = graft.operators.JpegCodec.decode(f)
      assert(w == 16 && h == 16)
      for (y <- 0 until h; x <- 0 until w) {
        val want = (seed + (x / 8) * 7 + (y / 8) * 13) % 256
        assert((px(y * w + x) & 0xff) == want, s"t=$t ($x,$y)")
      }
    }
  }

  test("truncated strl LIST rejects before reading past its declared end") {
    val good = Avi.encodeMjpeg(16, 16, 33000, Seq(jpeg(16, 16, 5)))
    // find the inner LIST/strl and shrink its declared length into the
    // [4, 24) window that used to read 20 bytes past the claimed end
    var i = 12; var strlOff = -1
    while (strlOff < 0 && i + 12 <= good.length) {
      if (new String(good, i, 4, "US-ASCII") == "LIST" &&
          new String(good, i + 8, 4, "US-ASCII") == "strl") strlOff = i
      else i += 1
    }
    assert(strlOff > 0)
    val bad = good.clone()
    bad(strlOff + 4) = 4; bad(strlOff + 5) = 0
    bad(strlOff + 6) = 0; bad(strlOff + 7) = 0
    val e = intercept[IllegalArgumentException](Avi.parseMjpeg(bad))
    assert(e.getMessage.contains("truncated"))
  }

  test("hostile inputs fail loudly") {
    val good = Avi.encodeMjpeg(16, 16, 33000, Seq(jpeg(16, 16, 5)))
    // truncation
    intercept[IllegalArgumentException] {
      Avi.parseMjpeg(java.util.Arrays.copyOfRange(good, 0, good.length / 2))
    }
    // wrong RIFF form
    val notAvi = good.clone(); notAvi(8) = 'W'.toByte
    intercept[IllegalArgumentException](Avi.parseMjpeg(notAvi))
    // near-2^31 chunk length must not wrap the bounds check
    val hostile = good.clone()
    val moviOff = {
      var i = 12; var found = -1
      while (found < 0 && i + 12 <= hostile.length) {
        if (new String(hostile, i, 4, "US-ASCII") == "LIST" &&
            new String(hostile, i + 8, 4, "US-ASCII") == "movi") found = i
        else i += 1
      }
      found
    }
    assert(moviOff > 0)
    val frameChunk = moviOff + 12 // first 00dc header
    hostile(frameChunk + 4) = 0xf0.toByte
    hostile(frameChunk + 5) = 0xff.toByte
    hostile(frameChunk + 6) = 0xff.toByte
    hostile(frameChunk + 7) = 0x7f.toByte
    intercept[IllegalArgumentException](Avi.parseMjpeg(hostile))
  }

  test("a stale idx1 index is a loud failure, not a silent short video") {
    val good = Avi.encodeMjpeg(16, 16, 33000,
      Seq(jpeg(16, 16, 5), jpeg(16, 16, 9)))
    // find idx1 and corrupt the second entry's size field
    var i = 12; var idxOff = -1
    while (idxOff < 0 && i + 8 <= good.length) {
      if (new String(good, i, 4, "US-ASCII") == "idx1") idxOff = i
      else i += 1
    }
    assert(idxOff > 0)
    val bad = good.clone()
    bad(idxOff + 8 + 16 + 12) = (bad(idxOff + 8 + 16 + 12) + 1).toByte
    val e = intercept[IllegalArgumentException](Avi.parseMjpeg(bad))
    assert(e.getMessage.contains("idx1"))
  }
}
