package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The peak-normalization contract ([[Multimodal.audioNormalizeStats]]):
  * Q15 integer gain to full scale, TRUNCATING output division (toward
  * zero, live on negative samples), bounded output range incl. the
  * full-scale -32768 edge, silent-stream unity passthrough, WAV/FLAC
  * container parity, already-normalized idempotence. */
class AudioNormalizeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("audio-normalize-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("media_id", "bytes")
      .withColumn("kind", org.apache.spark.sql.functions.lit("audio"))
  }

  private def statsOf(pcm: Array[Int]) = {
    val wav = Multimodal.WavCodec.encodePcm16(16000, pcm)
    Multimodal.audioNormalizeStats(mediaOf(Seq((1L, wav)))).collect().head
  }

  test("hand case: gain derivation and truncating outputs") {
    // peak = 1000 -> gain = 32767*32768/1000 = 1073709056/1000 = 1073709
    // v(s) = s*1073709/32768 toward zero:
    //   1000 -> 1073709000/32768 = 32766 (not 32767: gain floor is live)
    //   -3   -> -3221127/32768 = -98 (floored would be -99: trunc live)
    //   500  -> 536854500/32768 = 16383
    val r = statsOf(Array(1000, -3, 500))
    assert(r.getAs[Long]("peak_in") == 1000)
    assert(r.getAs[Long]("gain_q15") == 1073709)
    assert(r.getAs[Long]("peak_out") == 32766)
    val v = Array(32766L, -98L, 16383L)
    assert(r.getAs[Long]("energy") == v.map(x => x * x).sum)
    assert(r.getAs[Long]("checksum") ==
      v.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum)
  }

  test("full-scale -32768 input normalizes to exactly -32767") {
    val r = statsOf(Array(-32768, 16384))
    assert(r.getAs[Long]("peak_in") == 32768)
    assert(r.getAs[Long]("gain_q15") == 32767)
    // -32768*32767/32768 = -32767; 16384*32767/32768 = 16383
    assert(r.getAs[Long]("peak_out") == 32767)
    assert(r.getAs[Long]("checksum") == 1L * -32767 + 2L * 16383)
  }

  test("silent stream passes through at unity gain") {
    val r = statsOf(Array(0, 0, 0))
    assert(r.getAs[Long]("peak_in") == 0)
    assert(r.getAs[Long]("gain_q15") == 32768)
    assert(r.getAs[Long]("peak_out") == 0)
    assert(r.getAs[Long]("energy") == 0)
    assert(r.getAs[Long]("checksum") == 0)
  }

  test("an already-full-scale stream is a fixed point") {
    // peak 32767 -> gain = 32768 (unity): v = s*32768/32768 = s
    val pcm = Array(32767, -12345, 7, 0)
    val r = statsOf(pcm)
    assert(r.getAs[Long]("gain_q15") == 32768)
    assert(r.getAs[Long]("energy") ==
      pcm.map(x => x.toLong * x).sum)
    assert(r.getAs[Long]("checksum") ==
      pcm.zipWithIndex.map { case (x, i) => (i + 1).toLong * x }.sum)
  }

  test("WAV and FLAC encodes of the same PCM give identical stats") {
    val pcm = Array.tabulate(1100)(k => ((k * 29 + 17) % 4096) - 2048)
    val wav = Multimodal.WavCodec.encodePcm16(16000, pcm)
    val flac = graft.sources.Flac.encode(pcm, blockSize = 512)
    val rows = Multimodal.audioNormalizeStats(
      mediaOf(Seq((1L, wav), (2L, flac))))
      .collect().map(r => (r.getAs[Long]("gain_q15"),
        r.getAs[Long]("peak_out"), r.getAs[Long]("energy"),
        r.getAs[Long]("checksum"))).toSet
    assert(rows.size == 1, s"containers disagreed: $rows")
  }
}
