package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The DCT perceptual-hash contract ([[Multimodal.pHashOf]]): the Q14
  * table's exact integer identities, flat-image zero hash, EXACT
  * global brightness-shift invariance, box-mean scale invariance,
  * cross-container collision, perturbation locality vs inversion,
  * DC-bit-zero sign safety, and the downsample-only reject. */
class ImagePHashSpec extends AnyFunSuite {

  private lazy val sparkSession =
    org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("phash-spec")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", false)
      .getOrCreate()
  private def spark() = sparkSession

  private def gray(w: Int, h: Int, f: (Int, Int) => Int): Array[Int] =
    Array.tabulate(w * h) { k =>
      val v = f(k % w, k / w) & 0xff; (v << 16) | (v << 8) | v
    }

  private def hamming(a: String, b: String): Int =
    java.lang.Long.bitCount(
      java.lang.Long.parseUnsignedLong(a, 16) ^
        java.lang.Long.parseUnsignedLong(b, 16))

  test("Q14 table identities: constant DC row, EXACT zero AC row sums") {
    val t = Multimodal.dctCosQ14
    assert(t(0).forall(_ == 16384L))
    for (u <- 1 until 8)
      assert(t(u).sum == 0L, s"row $u sums to ${t(u).sum}, not 0")
    assert(t.flatten.forall(c => math.abs(c) <= 16384L))
  }

  test("flat image: all AC coefficients 0 -> zero hash, zero median") {
    val (hash, med) = Multimodal.pHashOf(40, 36, gray(40, 36, (_, _) => 128))
    assert(hash == "0000000000000000")
    assert(med == 0L)
  }

  test("global brightness shift changes NOTHING (hash and median)") {
    def img(off: Int) = gray(48, 40, (x, y) => 20 + off + (x / 8) * 13 + (y / 8) * 29)
    val (h0, m0) = Multimodal.pHashOf(48, 40, img(0))
    val (h5, m5) = Multimodal.pHashOf(48, 40, img(5))
    assert(h0 == h5 && m0 == m5)
    assert(h0 != "0000000000000000") // structure present
  }

  test("scale invariance: pixel-doubled image box-means to the same grid") {
    def f(x: Int, y: Int) = (x * 7 + y * 13 + (x * y) % 31) % 256
    val (h1, m1) = Multimodal.pHashOf(32, 32, gray(32, 32, f))
    val (h2, m2) = Multimodal.pHashOf(64, 64, gray(64, 64, (x, y) => f(x / 2, y / 2)))
    assert(h1 == h2 && m1 == m2)
  }

  test("cross-container collision: GIF and PNG of the same pixels") {
    def pix(x: Int, y: Int) = ((x / 8) * 37 + (y / 8) * 91) % 256
    val gif = Multimodal.ImageHeader.encodeGif(44, 38, pix)
    val png = Multimodal.ImageHeader.encodePngStored(44, 38, pix)
    val (wg, hg, pg) = Multimodal.decodeImage(gif)
    val (wp, hp, pp) = Multimodal.decodeImage(png)
    assert(Multimodal.pHashOf(wg, hg, pg) == Multimodal.pHashOf(wp, hp, pp))
  }

  test("local perturbation moves few bits; inversion scrambles ~all") {
    def f(x: Int, y: Int) = ((x / 8) * 23 + (y / 8) * 57 + 11) % 240
    val base = gray(48, 40, f)
    val bumped = gray(48, 40, (x, y) =>
      if (x < 8 && y < 8) f(x, y) + 15 else f(x, y))
    val inverted = gray(48, 40, (x, y) => 255 - f(x, y))
    val (h0, _) = Multimodal.pHashOf(48, 40, base)
    val (hb, _) = Multimodal.pHashOf(48, 40, bumped)
    val (hi, _) = Multimodal.pHashOf(48, 40, inverted)
    assert(hamming(h0, hb) <= 12, s"local bump moved ${hamming(h0, hb)} bits")
    assert(hamming(h0, hi) >= 40, s"inversion moved only ${hamming(h0, hi)} bits")
  }

  test("DC bit is always 0: packed hash stays below 2^63 (sign-free)") {
    for (seed <- 0 until 8) {
      val (hash, _) = Multimodal.pHashOf(40, 36,
        gray(40, 36, (x, y) => (seed * 31 + (x / 8) * 7 + (y / 8) * 13) % 256))
      assert(java.lang.Long.parseUnsignedLong(hash, 16) >= 0L,
        s"seed $seed produced a sign-bit hash $hash")
    }
  }

  test("orientNormalizedPHash reunites a rotated tagged photo with its twin") {
    val s = spark()
    import s.implicits._
    val w = 40; val h = 32
    def bv(bi: Int, bj: Int) = (bi * 37 + bj * 91 + 23) % 256
    val upright = Multimodal.ImageHeader.encodePngStored(w, h,
      (x, y) => bv(x / 8, y / 8))
    val tiff = Exif.encodeTiff(littleEndian = true, orientation = 6,
      make = "C", model = "M", gps = None)
    val base = JpegCodec.encodeJpegDcOnly(h, w,
      (bx, by) => bv(w / 8 - 1 - by, bx))
    val rotated = base.take(2) ++ Exif.encodeJpegApp1(tiff) ++ base.drop(2)
    val out = Multimodal.orientNormalizedPHash(
        Seq((1L, upright), (2L, rotated)).toDF("media_id", "bytes")
          .withColumn("kind", org.apache.spark.sql.functions.lit("image")))
      .orderBy("media_id").collect()
    assert(out(0).getAs[Int]("orientation") == 1)
    assert(out(1).getAs[Int]("orientation") == 6)
    assert(out(0).getAs[Long]("out_w") == w && out(1).getAs[Long]("out_w") == w)
    assert(out(0).getAs[String]("phash") == out(1).getAs[String]("phash"))
    assert(out.forall(_.getAs[Long]("n_same_hash") == 2))
    // without normalization the two containers hash APART
    val plain = Multimodal.imagePHash(
        Seq((1L, upright), (2L, rotated)).toDF("media_id", "bytes")
          .withColumn("kind", org.apache.spark.sql.functions.lit("image")))
      .orderBy("media_id").collect()
    assert(plain(0).getAs[String]("phash") != plain(1).getAs[String]("phash"))
  }

  test("banded pHash pairs: bumped twin found, inverted twin absent") {
    val s = spark()
    import s.implicits._
    def f(x: Int, y: Int) = ((x / 4) * 23 + (y / 4) * 57 + 11) % 200
    def png(g: (Int, Int) => Int) =
      Multimodal.ImageHeader.encodePngStored(48, 40, g)
    val m = Seq(
      (1L, png(f)),
      (2L, png((x, y) => f(x, y) + (if (x < 12 && y < 12) 15 else 0))),
      (3L, png((x, y) => 255 - f(x, y))))
      .toDF("media_id", "bytes")
      .withColumn("kind", org.apache.spark.sql.functions.lit("image"))
    val pairs = Multimodal.imagePHashNearDupPairs(m, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)), s"bumped twin missing: $pairs")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      s"inverted image paired: $pairs")
  }

  test("images below 32x32 reject loudly by name") {
    val e = intercept[IllegalArgumentException] {
      Multimodal.pHashOf(31, 40, gray(31, 40, (_, _) => 0))
    }
    assert(e.getMessage.contains("pHash"))
  }
}
