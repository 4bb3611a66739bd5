package graft.operators

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The scene-cut contract ([[Multimodal.gifSceneCuts]]): hand pair
  * diffs through real encoded animations, truncating mean, the STRICT
  * threshold boundary, scene counting, single-frame emptiness, and
  * the full-screen-frames reject. */
class GifSceneCutsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]").appName("gif-scene-cuts-spec")
    .config("spark.sql.shuffle.partitions", 2)
    .config("spark.ui.enabled", false)
    .getOrCreate()

  private def mediaOf(rows: Seq[(Long, Array[Byte])]) = {
    val s = spark
    import s.implicits._
    rows.toDF("media_id", "bytes")
      .withColumn("kind", org.apache.spark.sql.functions.lit("image"))
  }

  private def gif(w: Int, h: Int, fs: Seq[(Int, Int) => Int]): Array[Byte] =
    Multimodal.ImageHeader.encodeGifAnimated(w, h,
      fs.map(f => (0, 0, w, h, f)), fs.map(_ => 5))

  test("hand case: identical pair no cut, +100 shift pair cuts") {
    // 3 frames: f0 == f1 (diff 0), f2 = f0 + 100 (diff 100 everywhere)
    val f0 = (x: Int, y: Int) => 10 + x + y
    val f2 = (x: Int, y: Int) => 110 + x + y
    val out = Multimodal.gifSceneCuts(
        mediaOf(Seq((1L, gif(8, 4, Seq(f0, f0, f2))))))
      .orderBy("frame_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("frame_idx") == 1)
    assert(out(0).getAs[Long]("sum_abs_diff") == 0)
    assert(!out(0).getAs[Boolean]("is_cut"))
    assert(out(1).getAs[Long]("mean_diff") == 100)
    assert(out(1).getAs[Boolean]("is_cut"))
    assert(out.forall(_.getAs[Long]("n_scenes") == 2))
  }

  test("mean is the truncating floor(sum/n)") {
    // 4x1 frames differing by [1, 1, 2, 1]: sum 5, n 4 -> mean 1
    val a = (x: Int, _: Int) => 50
    val b = (x: Int, _: Int) => 50 + (if (x == 2) 2 else 1)
    val r = Multimodal.gifSceneCuts(mediaOf(Seq((1L, gif(4, 1, Seq(a, b))))))
      .collect().head
    assert(r.getAs[Long]("sum_abs_diff") == 5)
    assert(r.getAs[Long]("mean_diff") == 1)
  }

  test("the threshold is STRICT: mean == threshold is not a cut") {
    val a = (_: Int, _: Int) => 40
    val b = (_: Int, _: Int) => 56 // mean diff exactly 16
    val c = (_: Int, _: Int) => 73 // mean diff 17 from b
    val out = Multimodal.gifSceneCuts(
        mediaOf(Seq((1L, gif(6, 3, Seq(a, b, c))))))
      .orderBy("frame_idx").collect()
    assert(!out(0).getAs[Boolean]("is_cut"))
    assert(out(1).getAs[Boolean]("is_cut"))
    assert(out.forall(_.getAs[Long]("n_scenes") == 2))
  }

  test("a single-frame GIF yields no pair rows") {
    val one = Multimodal.ImageHeader.encodeGif(6, 4, (x, y) => x + y)
    assert(Multimodal.gifSceneCuts(mediaOf(Seq((1L, one)))).count() == 0)
  }

  test("sub-rectangle frames reject loudly by name") {
    val b = Multimodal.ImageHeader.encodeGifAnimated(8, 8, Seq(
      (0, 0, 8, 8, (_: Int, _: Int) => 1),
      (2, 2, 4, 4, (_: Int, _: Int) => 9)), Seq(5, 5))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.gifSceneCuts(mediaOf(Seq((1L, b)))).collect()
    }
    assert(e.getMessage.contains("scene-cut") ||
      e.getCause != null && e.getCause.getMessage.contains("scene-cut"))
  }
}
