package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-count + per-round-cost profile of the convergence loop in
  * Graph.connectedComponents over the events co-activity graph —
  * answers "how many rounds does the fixture actually need?" (the r10
  * fixed k=8 assumption was wrong at sf0.01: the graph converges later,
  * which both engines then hid by stopping at the same round).
  *
  * Usage: runMain graft.tools.ProfileGraph [sfDir]
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val edges = graft.queries.EventQueries.queries("ev_session_overlap")(spark, sfDir)
    val e = edges.select(col("user_a").cast("long").as("src"),
      col("user_b").cast("long").as("dst")).distinct()
    val sym = e.union(e.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val symSelf = sym.union(
        sym.select(col("src")).distinct()
          .select(col("src"), col("src").as("dst")))
      .persist()
    println(s"edges(sym+self) = ${symSelf.count()}")

    var lab = symSelf.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(true)
    def labelSum(d: DataFrame): java.math.BigDecimal = {
      val v = d.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      if (v == null) java.math.BigDecimal.ZERO else v
    }
    var prev = labelSum(lab)
    var converged = false
    var r = 0
    val mode = if (args.length > 1) args(1) else "plain"
    val batch = mode match { case "k2" => 2; case "k3" => 3; case _ => 1 }
    val t0 = System.nanoTime()
    while (!converged && r < 64) {
      val rt = System.nanoTime()
      var stepped = lab
      (1 to batch).foreach { _ =>
        stepped = symSelf.join(stepped, col("src") === col("node"))
          .groupBy(col("dst")).agg(min(col("label")).as("label"))
          .select(col("dst").as("node"), col("label"))
      }
      if (mode == "jump") {
        val prop = stepped
        stepped = prop.join(
          prop.select(col("node").as("l_node"), col("label").as("l_label")),
          col("label") === col("l_node"))
          .select(col("node"), col("l_label").as("label"))
      }
      val next = stepped.localCheckpoint(true)
      val s = labelSum(next)
      lab = next
      r += 1
      converged = s.compareTo(prev) == 0
      prev = s
      println(f"round $r%2d  ${(System.nanoTime() - rt) / 1e9}%6.3fs  sum=$s")
    }
    println(f"converged after $r rounds, total ${(System.nanoTime() - t0) / 1e9}%.2fs")
    spark.stop()
  }
}
