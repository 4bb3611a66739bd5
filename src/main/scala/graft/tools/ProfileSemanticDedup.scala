package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** nLists scale-dial measurement for semanticDedupPairs: the IVF
  * blocking holds within-cell pair volume ~ (n/nLists)² per cell, so
  * fixed nLists turns quadratic as the corpus grows and the documented
  * dial is nLists ∝ sqrt(n). This tool measures the same corpus at a
  * list of nLists values so BENCH_SF10.md can show the dial working
  * rather than assert it.
  *
  * Usage: runMain graft.tools.ProfileSemanticDedup <sfDir> <nLists,nLists,...>
  */
object ProfileSemanticDedup {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val lists = args.lift(1).getOrElse("16").split(",").map(_.trim.toInt)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    emb.count() // warm the table
    lists.foreach { k =>
      // two passes, min — same steady-state convention as graft.Bench
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val df = Similarity.semanticDedupPairs(emb, "vec_id", "embedding",
          0.35, nLists = k)
        df.write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"nLists=$k%-5d  secs=${times.min}%8.2f")
    }
    spark.stop()
  }
}
