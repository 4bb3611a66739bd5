package graft.tools

import org.apache.spark.sql.SparkSession

/** Byte-BPE trainer merge-scaling adjudication (VERDICT r18 item 5):
  * price the R-distributed-jobs loop against the gated-collect driver
  * trainer at production-shaped merge counts, and verify the merge
  * lists stay bit-identical at scale (the fixture spec pins small R;
  * this pins the sf1 type table).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/tmp/graft_sf1 \
  *          sbt 'runMain graft.tools.ProfileByteBpeTrain [R...]'
  */
object ProfileByteBpeTrain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft_sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rs = if (args.nonEmpty) args.toSeq.map(_.toInt) else Seq(64, 256)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.Tables.table(spark, sfDir, "documents")
    docs.write.mode("overwrite").format("noop").save() // warm the scan

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val out = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      out
    }

    for (r <- rs) {
      val local = time(s"local trainer    R=$r") {
        graft.operators.TextStats.byteBpeTrainMergesLocal(docs, "text", r)
      }
      val dist = time(s"distributed loop R=$r") {
        graft.operators.TextStats.byteBpeTrainMerges(docs, "text", r)
      }
      println(s"  R=$r merges: local=${local.size} dist=${dist.size} " +
        s"identical=${local == dist}")
    }
    spark.stop()
  }
}
