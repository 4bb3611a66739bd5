package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew experiment for the iterative graph frontier (VERDICT r11
  * stretch): the propagate round joins the edge list to the label
  * frontier on src — a power-law hub concentrates its edge rows in one
  * task. Measures min-label propagation to convergence three ways on a
  * hub-heavy fixture:
  *   plain   — the shipped shape (hash join on src, AQE on)
  *   salted  — labels replicated R ways, edges keyed (src, dst%R), so
  *             a hub's edges spread across R tasks at the cost of an
  *             R-times-larger broadcast/shuffle of the label frame
  *   noaqe   — plain with AQE off, isolating what AQE's skew handling
  *             already absorbs
  * Ship the salt only on a measured win (the pair-once lesson).
  *
  * Usage: runMain graft.tools.ProfileGraphSkew [nSpokes] [nHubs] [salt]
  */
object ProfileGraphSkew {
  def main(args: Array[String]): Unit = {
    val nSpokes = args.lift(0).map(_.toInt).getOrElse(300000)
    val nHubs = args.lift(1).map(_.toInt).getOrElse(8)
    val salt = args.lift(2).map(_.toInt).getOrElse(8)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // hub h owns spokes [h*nSpokes, (h+1)*nSpokes); hubs chained so the
    // whole graph is ONE component and propagation takes several rounds
    val edges = spark.range(nHubs.toLong * nSpokes).select(
        (col("id") / nSpokes).cast("long").as("h"), col("id").as("i"))
      .select((col("h") * nSpokes * 10 + 1).as("src"),
        (col("h") * nSpokes * 10 + 2 + col("i") % nSpokes).as("dst"))
      .union(spark.range(nHubs - 1L).select(
        (col("id") * nSpokes * 10 + 1).as("src"),
        ((col("id") + 1) * nSpokes * 10 + 1).as("dst")))
      .localCheckpoint()
    println(s"edges: ${edges.count()} (hub degree $nSpokes, $nHubs hubs)")

    def sym(e: DataFrame): DataFrame = {
      val d = e.select(col("src"), col("dst"))
      val s = d.union(d.select(col("dst").as("src"), col("src").as("dst")))
      s.union(s.select(col("src")).distinct()
        .select(col("src"), col("src").as("dst"))).localCheckpoint()
    }

    def propagateRounds(symSelf: DataFrame, rounds: Int,
        saltWays: Int): DataFrame = {
      var lab = symSelf.select(col("src").as("node")).distinct()
        .select(col("node"), col("node").as("label")).localCheckpoint()
      for (_ <- 0 until rounds) {
        val next =
          if (saltWays <= 1)
            symSelf.join(lab, col("src") === col("node"))
              .groupBy(col("dst")).agg(min(col("label")).as("label"))
              .select(col("dst").as("node"), col("label"))
          else {
            val saltedLab = lab.crossJoin(
                spark.range(saltWays).toDF("__s"))
              .select(col("node"), col("__s").as("__sl"), col("label"))
            symSelf
              .withColumn("__s", pmod(col("dst"), lit(saltWays)))
              .join(saltedLab,
                col("src") === col("node") && col("__s") === col("__sl"))
              .groupBy(col("dst")).agg(min(col("label")).as("label"))
              .select(col("dst").as("node"), col("label"))
          }
        lab = next.localCheckpoint()
      }
      lab
    }

    def time(name: String)(f: => Long): Unit = {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-10s secs=${times.map(_._1).min}%8.2f rows=${times.head._2}")
    }

    val s0 = sym(edges)
    val rounds = 6
    time("plain")(propagateRounds(s0, rounds, 1).count())
    time(s"salt=$salt")(propagateRounds(s0, rounds, salt).count())
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    time("noaqe")(propagateRounds(s0, rounds, 1).count())
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
  }
}
