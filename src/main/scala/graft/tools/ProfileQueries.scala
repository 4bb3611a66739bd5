package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query wall-time profiler: runs each named query `reps` times in
  * one JVM so cold (planning + codegen compile) vs warm (execution-only)
  * cost separates. Usage:
  *   SPARK_GRAFT_SF_DIR=... sbt 'runMain graft.tools.ProfileQueries q1 q2 ...'
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("GRAFT_PROFILE_REPS", "3").toInt
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val rows = graft.SparkEntry.queries(n)(spark, sfDir).count()
        ((System.nanoTime() - t0) / 1e9, rows)
      }
      val ts = times.map(t => f"${t._1}%6.2f").mkString(" ")
      println(f"[prof] $n%-24s $ts  rows=${times.head._2}")
    }
    spark.stop()
  }
}
