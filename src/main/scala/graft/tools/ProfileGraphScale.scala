package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Degree profile of the co-activity graph across scales: edge count,
  * max degree, sum(deg^2) (the wedge-join row count) — the numbers
  * that decide whether triangle counting / link prediction survive a
  * density increase. */
object ProfileGraphScale {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- args) {
      val pairs = graft.queries.EventQueries.coactivityPairs(spark, dir)
        .localCheckpoint(true)
      val nE = pairs.count()
      val deg = pairs.select(col("user_a").as("u"))
        .unionAll(pairs.select(col("user_b").as("u")))
        .groupBy("u").agg(count(lit(1)).as("d"))
      val r = deg.agg(count(lit(1)).as("nodes"), max(col("d")).as("maxd"),
        sum(col("d") * col("d")).as("sumd2")).head
      println(s"$dir edges=$nE nodes=${r.getLong(0)} maxDeg=${r.getLong(1)} " +
        s"sumDeg2=${r.getLong(2)}")
    }
    spark.stop()
  }
}
