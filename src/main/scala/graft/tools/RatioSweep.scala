package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.{Bbox, Circle}
import graft.operators.{ImportSpec, PointCloud}
import graft.queries.PointCloudQueries

/** Head/tail ratio sweep — the reference's s1/s2/s3 import suites
  * (scripts/import_20m_s1.json ratios 0.5–0.8 etc.): imports the test
  * cloud at each ratio, persists the sorted-parquet layout, reopens it
  * and times representative queries against the STORED form (the
  * production path, where row-group stats do the pruning). The ratio
  * knob trades index selectivity (more, smaller blocks) against
  * per-block overhead, exactly as in the reference
  * (point_processor.py:11-21). Results are committed as RATIO.md.
  *
  * Usage: sbt 'runMain graft.tools.RatioSweep [sfDir] [ratios...]'
  */
object RatioSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ratios = if (args.length > 1) args.tail.map(_.toDouble).toSeq
      else Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pts = PointCloudQueries.rawPoints(spark, sfDir)
    val small = Bbox(1000, 1300, 2000, 2300)
    val large = Bbox(1000, 5000, 1000, 5000)
    val circle = Circle(3000.5, 3000.5, 200.3)
    def timeMin(f: => Long): (Double, Long) = {
      var best = Double.MaxValue
      var rows = 0L
      (1 to 2).foreach { _ =>
        val t = System.nanoTime()
        rows = f
        best = math.min(best, (System.nanoTime() - t) / 1e9)
      }
      (best, rows)
    }
    println(f"${"ratio"}%6s ${"head/tail"}%10s ${"blocks"}%8s ${"pts/blk"}%8s " +
      f"${"import_s"}%9s ${"small_s"}%8s ${"large_s"}%8s ${"circle_s"}%9s ${"knn_s"}%6s")
    ratios.foreach { r =>
      val t0 = System.nanoTime()
      val c0 = PointCloud.importPoints(pts, ImportSpec(name = "sweep", ratio = r))
      val dir = s"/tmp/graft_ratio_sweep/${sfDir.replaceAll("[^A-Za-z0-9.]", "_")}_$r"
      PointCloud.write(c0, dir)
      val importS = (System.nanoTime() - t0) / 1e9
      val c = PointCloud.read(spark, dir)
      val nBlocks = c.blocks.count()
      val (sS, _) = timeMin(c.bboxQuery(small).count())
      val (lS, _) = timeMin(c.bboxQuery(large).count())
      val (cS, _) = timeMin(c.circleQuery(circle).count())
      val (kS, _) = timeMin(c.knn(3000.5, 3000.5, 100).count())
      println(f"$r%6.2f ${c.meta.headLen}%4d/${c.meta.tailLen}%-5d $nBlocks%8d " +
        f"${c.meta.pointCount / nBlocks}%8d $importS%9.2f $sS%8.3f $lS%8.3f $cS%9.3f $kS%6.3f")
    }
    spark.stop()
  }
}
