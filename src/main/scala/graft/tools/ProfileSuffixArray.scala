package graft.tools

import org.apache.spark.sql.SparkSession

/** Dissect doc_repeated_spans: doubling loop vs SA+lifting+report. */
object ProfileSuffixArray {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BCAST", "10485760"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.table(spark, sfDir, "documents")
    docs.write.mode("overwrite").format("noop").save() // warm

    def time(label: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-24s ${ts.min}%6.2f s  (runs: ${ts.map(t => f"$t%.2f").mkString(", ")})")
    }

    time("doubling loop only") {
      val (ranks, tables, rep) = graft.operators.SuffixArray
        .doublingRanks(docs, "doc_id", "text")
      println("  report: " + rep)
      tables.foreach(t => graft.operators.Frames.free(t.frame))
      graft.operators.Frames.free(ranks)
    }
    time("full repeatedSpans") {
      graft.operators.SuffixArray.repeatedSpans(docs, "doc_id", "text", 8)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
