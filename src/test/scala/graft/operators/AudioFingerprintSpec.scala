package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

class AudioFingerprintSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def mediaOf(rows: Seq[(Long, Array[Byte])]): DataFrame = {
    import spark.implicits._
    rows.toDF("media_id", "bytes")
      .selectExpr("media_id", "'audio' AS kind", "bytes")
  }

  private def fpOf(df: DataFrame): Map[Long, (Long, Long, String, Long)] =
    Multimodal.audioFingerprint(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .toMap

  test("strictly growing energy contour sets every full-window bit") {
    // |s| grows with k -> each full 256-window out-energies the last;
    // 1024 samples = 8 windows, the 8th is the short 128-sample tail
    // (lower energy than window 6) -> bits 0..5 set, bit 6 clear
    val pcm = Array.tabulate(1024)(k => k + 1)
    val m = fpOf(mediaOf(Seq(0L -> Multimodal.WavCodec.encodePcm16(16000, pcm))))
    val (n, nw, fp, _) = m(0L)
    assert(n == 1024L && nw == 8L)
    assert(fp == "000000000000003f", fp)
  }

  test("same PCM through WAV and FLAC collides (cross-container dedup contract)") {
    val pcm = Array.tabulate(2300)(k => ((k * 7919 + 13) % 4096) - 2048)
    val m = fpOf(mediaOf(Seq(
      1L -> Multimodal.WavCodec.encodePcm16(16000, pcm),
      2L -> graft.sources.Flac.encode(pcm, blockSize = 512))))
    assert(m(1L)._3 == m(2L)._3, s"containers disagree: $m")
    assert(m(1L)._1 == 2300L && m(2L)._1 == 2300L)
    assert(m.values.forall(_._4 == 2L))
  }

  test("amplitude scaling and polarity flip leave the contour unchanged; different PCM differs") {
    val pcm = Array.tabulate(1800)(k => ((k * 131 + 7) % 2000) - 1000)
    def enc(f: Int => Int) =
      Multimodal.WavCodec.encodePcm16(16000, pcm.map(f))
    val m = fpOf(mediaOf(Seq(
      10L -> enc(identity), 11L -> enc(s => -s), 12L -> enc(s => s * 3),
      13L -> Multimodal.WavCodec.encodePcm16(16000,
        Array.tabulate(1800)(k => if (k < 900) 2000 - k else k - 900)))))
    assert(m(10L)._3 == m(11L)._3, "polarity flip moved a bit")
    assert(m(10L)._3 == m(12L)._3, "3x amplitude moved a bit")
    assert(m(10L)._3 != m(13L)._3, "unrelated contour collided")
  }

  test("non-audio signatures reject loudly") {
    val e = intercept[Exception] {
      fpOf(mediaOf(Seq(0L -> Array[Byte](1, 2, 3, 4, 5))))
    }
    assert(e.getMessage != null)
  }
}
