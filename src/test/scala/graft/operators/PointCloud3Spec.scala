package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PointCloud3Spec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("3D box query reproduces the naive filter on random data") {
    val rng = new scala.util.Random(11)
    val pts = (1 to 5000).map { _ =>
      (rng.nextInt(100).toDouble, rng.nextInt(100).toDouble,
        rng.nextInt(3000) / 100.0) // z at 2 decimals like the fixtures
    }
    val df = pts.toDF("x", "y", "z")
    val c = PointCloud3.importPoints(df, zDenom = 100.0, ratio = 0.5)
    val got = c.boxQuery(10, 60, 20, 80, 5.005, 20.005)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val want = pts.filter { case (x, y, z) =>
      x >= 10 && x <= 60 && y >= 20 && y <= 80 && z >= 5.005 && z <= 20.005
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(got == want && want.nonEmpty)
  }

  test("polygon prism reproduces the naive ray-cast + z-band filter") {
    val rng = new scala.util.Random(23)
    val pts = (1 to 5000).map { _ =>
      (rng.nextInt(100).toDouble, rng.nextInt(100).toDouble,
        rng.nextInt(3000) / 100.0)
    }
    val df = pts.toDF("x", "y", "z")
    val c = PointCloud3.importPoints(df, zDenom = 100.0, ratio = 0.5)
    // L-shape: [10,60]x[10,40] U [10,40]x[10,60], boundary excluded
    val wkt = "POLYGON ((9.5 9.5, 60.5 9.5, 60.5 40.5, 40.5 40.5, " +
      "40.5 60.5, 9.5 60.5, 9.5 9.5))"
    val got = c.polygonQuery(wkt, 5.005, 20.005)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(identity).view.mapValues(_.length).toMap
    val want = pts.filter { case (x, y, z) =>
      ((x >= 10 && x <= 60 && y >= 10 && y <= 40) ||
        (x >= 10 && x <= 40 && y >= 10 && y <= 60)) &&
        z >= 5.005 && z <= 20.005
    }.groupBy(identity).view.mapValues(_.length).toMap
    assert(got == want && want.nonEmpty)
  }

  test("3D knn returns the k closest by true 3D distance") {
    val rng = new scala.util.Random(31)
    val pts = (1 to 3000).map { _ =>
      (rng.nextInt(200).toDouble, rng.nextInt(200).toDouble,
        rng.nextInt(5000) / 100.0)
    }
    val df = pts.toDF("x", "y", "z")
    val c = PointCloud3.importPoints(df, zDenom = 100.0, ratio = 0.5)
    val (px, py, pz) = (100.5, 100.5, 25.0)
    def d2(p: (Double, Double, Double)): Double =
      (p._1 - px) * (p._1 - px) + (p._2 - py) * (p._2 - py) + (p._3 - pz) * (p._3 - pz)
    val got = c.knn(px, py, pz, 50)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    assert(got.length == 50)
    // the farthest returned neighbour is no farther than the true 50th
    val kth = pts.map(d2).sorted.apply(49)
    assert(got.map(d2).max <= kth + 1e-9)
    assert(got.map(d2).toSeq == got.map(d2).toSeq.sorted)
  }

  test("empty and full boxes behave") {
    val df = Seq((1.0, 2.0, 3.0), (4.0, 5.0, 6.0)).toDF("x", "y", "z")
    val c = PointCloud3.importPoints(df, zDenom = 100.0, ratio = 0.5)
    assert(c.boxQuery(0, 10, 0, 10, 0, 10).count() == 2)
    assert(c.boxQuery(0, 10, 0, 10, 7, 10).count() == 0)
    assert(c.meta.pointCount == 2)
  }

  test("streamed 3D appends are exactly-once and equal a batch rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pc3_stream").toString
    val rng = new scala.util.Random(23)
    def cloudPts(n: Int) = (1 to n).map { _ =>
      (rng.nextInt(100).toDouble, rng.nextInt(100).toDouble,
        rng.nextInt(3000) / 100.0)
    }
    val base = cloudPts(2000)
    val d1 = cloudPts(300)
    val d2 = cloudPts(250)
    PointCloud3.write(
      PointCloud3.importPoints(base.toDF("x", "y", "z"), zDenom = 100.0, ratio = 0.5), dir)

    // two micro-batches through the streaming ingest entry point...
    val ingest = graft.streaming.Streams.cloud3Ingest(spark, dir)
    ingest(d1.toDF("x", "y", "z"), 0L)
    ingest(d2.toDF("x", "y", "z"), 1L)
    // ...then an at-least-once REPLAY of batch 1 (sink failure before
    // the checkpoint commit): must overwrite, not double-append
    ingest(d2.toDF("x", "y", "z"), 1L)

    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)))
        .groupBy(identity).view.mapValues(_.length).toMap
    val streamed = PointCloud3.read(spark, dir)
    val rebuilt = PointCloud3.importPoints(
      (base ++ d1 ++ d2).toDF("x", "y", "z"), zDenom = 100.0, ratio = 0.5)
    assert(streamed.meta.pointCount == 2550) // ledger saw each batch once
    assert(multiset(streamed.boxQuery(5, 95, 5, 95, 1.005, 25.005)) ==
      multiset(rebuilt.boxQuery(5, 95, 5, 95, 1.005, 25.005)))
    // fragmentation is real (delta heads coexist with base heads)...
    assert(streamed.blocks.groupBy("sfc_head").count().filter("count > 1").count() > 0)

    // the envelope guard mirrors the 2D store: a point outside the
    // power-of-two key space is rejected, not silently unqueryable
    val e = intercept[IllegalArgumentException] {
      ingest(Seq((5000.0, 5000.0, 1.0)).toDF("x", "y", "z"), 2L)
    }
    assert(e.getMessage.contains("key space"))
    // and an empty micro-batch is a no-op, not an error
    ingest(Seq.empty[(Double, Double, Double)].toDF("x", "y", "z"), 3L)
    assert(PointCloud3.read(spark, dir).meta.pointCount == 2550)

    // compaction: one clustered block per head again, ledger folded
    // into the base meta, delta dirs gone, results unchanged
    PointCloud3.compact(spark, dir)
    val compacted = PointCloud3.read(spark, dir)
    assert(compacted.blocks.groupBy("sfc_head").count().filter("count > 1").isEmpty)
    assert(compacted.meta.pointCount == 2550)
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/blocks_delta")))
    assert(multiset(compacted.boxQuery(5, 95, 5, 95, 1.005, 25.005)) ==
      multiset(rebuilt.boxQuery(5, 95, 5, 95, 1.005, 25.005)))
  }
}
