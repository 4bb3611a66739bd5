package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Bbox
import graft.operators.{ImportSpec, PointCloud}
import graft.queries.PointCloudQueries

/** Head/tail ratio sweep — the reference's s1/s2/s3 import suites
  * (scripts/import_20m_s1.json ratios 0.5–0.8 etc.): imports the test
  * cloud at each ratio and reports block count, mean occupancy, import
  * time, and a representative bbox-query time. The ratio knob trades
  * index selectivity (more, smaller blocks) against per-block overhead,
  * exactly as in the reference (point_processor.py:11-21).
  *
  * Usage: sbt 'runMain graft.tools.RatioSweep [sfDir] [ratios...]'
  */
object RatioSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val ratios = if (args.length > 1) args.tail.map(_.toDouble).toSeq
      else Seq(0.3, 0.5, 0.6, 0.7, 0.8)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pts = PointCloudQueries.rawPoints(spark, sfDir)
    val bbox = Bbox(1000, 1300, 2000, 2300)
    println(f"${"ratio"}%6s ${"head/tail"}%10s ${"blocks"}%8s ${"pts/blk"}%8s ${"import_s"}%9s ${"query_s"}%8s ${"rows"}%6s")
    ratios.foreach { r =>
      val t0 = System.nanoTime()
      val c = PointCloud.importPoints(pts, ImportSpec(name = s"sweep", ratio = r))
      val blocks = c.blocks.cache()
      val nBlocks = blocks.count()
      val importS = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val rows = c.bboxQuery(bbox).count()
      val queryS = (System.nanoTime() - t1) / 1e9
      println(f"$r%6.2f ${c.meta.headLen}%4d/${c.meta.tailLen}%-5d $nBlocks%8d ${c.meta.pointCount / nBlocks}%8d $importS%9.2f $queryS%8.2f $rows%6d")
      blocks.unpersist()
    }
    spark.stop()
  }
}
