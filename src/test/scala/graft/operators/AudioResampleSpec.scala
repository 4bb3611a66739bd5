package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The audio decimation contract ([[Multimodal.audioResampleStats]]):
  * TRUNCATING-mean windows (Java `/` toward zero — the same semantics
  * as Spark's integer `div` and DuckDB's integer `//`, LIVE on signed
  * sums where floored division would differ), dropped incomplete
  * tail, WAV/FLAC container parity (lossless pair -> identical
  * resampled stats), factor 1 = identity stats. */
class AudioResampleSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("audio-resample-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("media_id", "bytes")
      .withColumn("kind", org.apache.spark.sql.functions.lit("audio"))
  }

  test("truncating-mean windows with dropped tail, hand-computed") {
    // 10 samples, factor 4 -> 2 full windows, 2-sample tail dropped.
    // window sums: (3 - 7 + 2 - 1) = -3 -> -3/4 = 0 toward zero
    // (floored division would give -1 — the distinction is live);
    // (5 + 5 + 5 + 6) = 21 -> 5
    val pcm = Array(3, -7, 2, -1, 5, 5, 5, 6, 9, 9)
    val wav = Multimodal.WavCodec.encodePcm16(16000, pcm)
    val r = Multimodal.audioResampleStats(mediaOf(Seq((1L, wav))), factor = 4)
      .collect().head
    assert(r.getAs[Long]("n_in") == 10)
    assert(r.getAs[Long]("n_out") == 2)
    // v = [0, 5]: energy 25, peak 5, checksum 1*0 + 2*5 = 10
    assert(r.getAs[Long]("energy") == 25)
    assert(r.getAs[Long]("peak") == 5)
    assert(r.getAs[Long]("checksum") == 10)
  }

  test("WAV and FLAC encodes of the same PCM give identical stats") {
    val pcm = Array.tabulate(1500)(k => ((k * 37 + 11) % 4096) - 2048)
    val wav = Multimodal.WavCodec.encodePcm16(16000, pcm)
    val flac = graft.sources.Flac.encode(pcm, blockSize = 512)
    val rows = Multimodal.audioResampleStats(
      mediaOf(Seq((1L, wav), (2L, flac))), factor = 4)
      .collect().map(r => (r.getAs[Long]("energy"), r.getAs[Long]("peak"),
        r.getAs[Long]("checksum"))).toSet
    assert(rows.size == 1, s"containers disagreed: $rows")
  }

  test("factor 1 is the identity (stats of the raw PCM)") {
    val pcm = Array(-3, 0, 7, -2)
    val wav = Multimodal.WavCodec.encodePcm16(8000, pcm)
    val r = Multimodal.audioResampleStats(mediaOf(Seq((1L, wav))), factor = 1)
      .collect().head
    assert(r.getAs[Long]("n_out") == 4)
    assert(r.getAs[Long]("energy") == 9 + 0 + 49 + 4)
    assert(r.getAs[Long]("peak") == 7)
    assert(r.getAs[Long]("checksum") == -3 + 0 + 3 * 7 - 4 * 2)
  }

  test("factor below 1 rejects loudly") {
    intercept[IllegalArgumentException](
      Multimodal.audioResampleStats(mediaOf(Seq.empty), factor = 0))
  }
}
