package graft.tools

import org.apache.spark.sql.SparkSession

import graft.core.Bbox
import graft.queries.PointCloudQueries

/** Micro-benchmark: fused ExplodeBlock generator vs composed
  * arrays_zip+explode+decode (flip with -Dgraft.fusedExplode). */
object ProfileExplode {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val c = PointCloudQueries.cloud(spark, dir)
    val full = Bbox(0, 8191, 0, 8191)
    println(s"fusedExplode=${System.getProperty("graft.fusedExplode", "true")}")
    for (round <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = c.bboxQuery(full).count()
      println(f"round $round: full explode ${(System.nanoTime() - t0) / 1e9}%6.2fs  ($n points)")
    }
    spark.stop()
  }
}
