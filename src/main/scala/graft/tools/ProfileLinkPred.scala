package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Head-to-head variants of the linkPrediction materialization/join
  * strategy on the 10x fixture (PLANS.md adjudication). */
object ProfileLinkPred {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/graft_sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def pipeline(e: DataFrame, bcastAnti: Boolean, bcastDeg: Boolean): DataFrame = {
      val adj = e.select(col("lo").as("z"), col("hi").as("n"))
        .union(e.select(col("hi").as("z"), col("lo").as("n")))
      val deg0 = adj.groupBy(col("z")).agg(count(lit(1)).as("deg"))
      val deg = if (bcastDeg) broadcast(deg0) else deg0
      val adjd = adj.join(deg, "z")
      val wedges = adjd.select(col("z"), col("n").as("u"), col("deg"))
        .join(adjd.select(col("z"), col("n").as("v")), "z")
        .filter(col("u") < col("v"))
      val anti = if (bcastAnti) broadcast(e) else e
      val cand = wedges.join(anti,
        wedges("u") === anti("lo") && wedges("v") === anti("hi"), "left_anti")
      cand.groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("common_neighbors"),
          sum(expr("1000000L div deg")).as("ra_micro"))
        .orderBy(col("ra_micro").desc, col("common_neighbors").desc,
          col("u"), col("v"))
        .limit(25)
    }

    def canonical(s: SparkSession): DataFrame = {
      val raw = graft.queries.EventQueries.coactivityPairs(s, dir)
        .select(col("user_a").cast("long").as("x"), col("user_b").cast("long").as("y"))
        .filter(col("x") =!= col("y"))
      raw.select(least(col("x"), col("y")).as("lo"),
        greatest(col("x"), col("y")).as("hi")).distinct()
    }

    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    for (pass <- 1 to 2) {
      time(s"A ckpt plain        p$pass") {
        val e = canonical(spark).localCheckpoint(true)
        pipeline(e, bcastAnti = false, bcastDeg = false)
          .write.format("noop").mode("overwrite").save()
        e.queryExecution.analyzed.collectLeaves().foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
          case _ => () }
      }
      time(s"B ckpt bcast        p$pass") {
        val e = canonical(spark).localCheckpoint(true)
        pipeline(e, bcastAnti = true, bcastDeg = true)
          .write.format("noop").mode("overwrite").save()
        e.queryExecution.analyzed.collectLeaves().foreach {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
          case _ => () }
      }
      time(s"C nocache bcast     p$pass") {
        val e = canonical(spark)
        pipeline(e, bcastAnti = true, bcastDeg = true)
          .write.format("noop").mode("overwrite").save()
      }
      time(s"D nocache plain     p$pass") {
        val e = canonical(spark)
        pipeline(e, bcastAnti = false, bcastDeg = false)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
