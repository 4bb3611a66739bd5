package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Where does doc_dup_clusters spend its time? (scratch profiler) */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[prof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2fs")
      r
    }

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
      shingleLen = 3, wordShingles = true, numHashes = 64, bands = 16,
      threshold = 0.8).select("id_a", "id_b")
    time("pairs materialize")(pairs.count())
    val clusters = time("duplicateClusters build+run")(
      Dedup.duplicateClusters(pairs))
    time("final count")(clusters.count())

    // per-phase replay of the loop
    val edges = time("edges checkpoint")(
      pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
        .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .distinct().localCheckpoint())
    var labels = time("labels init")(
      edges.select(col("src").as("id")).distinct()
        .withColumn("cluster_id", col("id")).localCheckpoint())
    var prevSum = time("witness agg")(
      labels.agg(sum(col("cluster_id"))).head().getLong(0))
    var converged = false
    var it = 0
    while (!converged && it < 15) {
      labels = time(s"iter $it join+agg+ckpt") {
        val viaNeighbor = edges
          .join(labels.withColumnRenamed("id", "dst2"), col("dst") === col("dst2"))
          .groupBy(col("src").as("id"))
          .agg(min(col("cluster_id")).as("nb_min"))
        labels.join(viaNeighbor, "id")
          .select(col("id"), least(col("cluster_id"), col("nb_min")).as("cluster_id"))
          .localCheckpoint()
      }
      val s = time(s"iter $it witness")(labels.agg(sum(col("cluster_id"))).head().getLong(0))
      converged = s == prevSum
      prevSum = s
      it += 1
    }
    spark.stop()
  }
}
