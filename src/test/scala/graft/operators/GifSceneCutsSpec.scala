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

  test("scene reps: first frame per scene with exact pixel stats") {
    // frames f0, f0, f2: scenes [0, 0, 1] -> reps (0: frame 0, len 2),
    // (1: frame 2, len 1)
    val f0 = (x: Int, y: Int) => 10 + x + y
    val f2 = (x: Int, y: Int) => 110 + x + y
    val out = Multimodal.gifSceneReps(
        mediaOf(Seq((1L, gif(4, 2, Seq(f0, f0, f2))))))
      .orderBy("scene_idx").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("rep_frame_idx") == 0)
    assert(out(0).getAs[Long]("n_frames") == 2)
    assert(out(1).getAs[Long]("rep_frame_idx") == 2)
    assert(out(1).getAs[Long]("n_frames") == 1)
    val vals0 = for (y <- 0 until 2; x <- 0 until 4) yield f0(x, y).toLong
    assert(out(0).getAs[Long]("rep_sum_gray") == vals0.sum)
    assert(out(0).getAs[Long]("rep_checksum") ==
      vals0.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum)
    assert(out(1).getAs[Long]("rep_sum_gray") == vals0.sum + 100L * 8)
  }

  test("scene reps: a single-frame GIF is one scene, its only frame") {
    val one = Multimodal.ImageHeader.encodeGif(6, 4, (x, y) => x + y)
    val out = Multimodal.gifSceneReps(mediaOf(Seq((1L, one)))).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("scene_idx") == 0)
    assert(out.head.getAs[Long]("rep_frame_idx") == 0)
    assert(out.head.getAs[Long]("n_frames") == 1)
  }

  test("cuts and reps agree: n_scenes == rep row count") {
    val fs = Seq[(Int, Int) => Int](
      (x, y) => 10 + x, (x, y) => 13 + x, // same scene (diff 3)
      (x, y) => 140 + y, // cut
      (x, y) => 141 + y, // same scene
      (x, y) => 30 + x + y) // cut
    val m = mediaOf(Seq((1L, gif(8, 6, fs))))
    val nScenes = Multimodal.gifSceneCuts(m)
      .select("n_scenes").collect().head.getLong(0)
    assert(Multimodal.gifSceneReps(m).count() == nScenes)
    assert(nScenes == 3)
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
