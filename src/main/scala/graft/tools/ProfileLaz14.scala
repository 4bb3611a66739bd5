package graft.tools

import org.apache.spark.sql.{SparkSession, functions => F}

/** Measures what layer-selective decompression buys on a layered
  * (compressor 3) LAZ file: full-schema scan vs codec-pruned x/y/z
  * scan vs single-attribute scan of the same pf8 file. Evidence for
  * PLANS.md — the layered format's projection pushdown is a codec
  * property, not a parquet property, so it has to be measured here. */
object ProfileLaz14 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val li = graft.Tables.table(spark, sfDir, "lineitem")
    val df = li.select(
      ((F.col("l_orderkey") * 17 + F.col("l_linenumber") * 131) % 8192)
        .cast("double").as("x"),
      ((F.col("l_partkey") * 29 + F.col("l_suppkey") * 197) % 8192)
        .cast("double").as("y"),
      F.col("l_quantity").as("z"),
      ((F.col("l_orderkey") * 7 + F.col("l_linenumber")) % 65536).cast("int").as("intensity"),
      (F.lit(1) + F.col("l_orderkey") % (F.lit(1) + F.col("l_linenumber") % 5))
        .cast("int").as("return_number"),
      (F.lit(1) + F.col("l_linenumber") % 5).cast("int").as("number_of_returns"),
      (F.col("l_suppkey") % 4).cast("int").as("scanner_channel"),
      (F.col("l_partkey") % 32).cast("int").as("classification"),
      (F.col("l_orderkey") % 601 - 300).cast("int").as("scan_angle"),
      (F.col("l_suppkey") % 256).cast("int").as("user_data"),
      (F.col("l_partkey") % 1024).cast("int").as("point_source"),
      (F.col("l_orderkey") % 1000000).cast("double").as("gps_time"),
      (F.col("l_partkey") % 65536).cast("int").as("r"),
      (F.col("l_suppkey") % 65536).cast("int").as("g"),
      (F.col("l_orderkey") % 65536).cast("int").as("b"),
      (F.col("l_linenumber") * 13 % 65536).cast("int").as("nir"))

    val path = "/tmp/graft_profile_laz14.laz"
    val t0 = System.nanoTime()
    graft.sources.Laz14.writePoints14(df, path, chunkPoints = 50000, pointFormat = 8)
    val tw = (System.nanoTime() - t0) / 1e9
    val fileMb = java.nio.file.Files.size(java.nio.file.Paths.get(path)) / 1e6
    val nPts = df.count()
    val rawMb = nPts * 38 / 1e6
    println(f"write: $tw%.2f s, $nPts pts, $fileMb%.1f MB laz vs $rawMb%.1f MB raw records")

    def time(label: String, cols: Seq[String]): Unit = {
      // warm once, then min of 3
      def once(): Double = {
        val s = System.nanoTime()
        val n = graft.sources.Laz14.readPoints14(spark, path, columns = cols).count()
        require(n == nPts)
        (System.nanoTime() - s) / 1e9
      }
      once()
      val best = (1 to 3).map(_ => once()).min
      println(f"$label%-28s ${best}%.2f s  (cols: ${cols.mkString(",")})")
    }
    time("full schema (19 cols)",
      Seq("x", "y", "z", "intensity", "return_number", "number_of_returns",
        "scanner_channel", "classification", "scan_angle", "user_data",
        "point_source", "gps_time", "classification_flags", "scan_direction",
        "edge_of_flight", "r", "g", "b", "nir"))
    time("xyz only (codec-pruned)", Seq("x", "y", "z"))
    time("xy + gps only", Seq("x", "y", "gps_time"))
    spark.stop()
  }
}
