package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** State-store sharding experiment (VERDICT r16 item 5): BENCH_STREAM
  * predicts that past ~200k accumulated state rows per partition the
  * HDFS-backed store's commit becomes the visible per-batch term, and
  * names canonical-URL key-space sharding (more state partitions) as
  * the lever. This measures exactly that term in isolation: a
  * minimal MemoryStream -> urlDedup pipeline (no WARC parse, no
  * gates — per-row work ~0) fed BATCHES of brand-new canonical URLs,
  * so state grows by exactly the batch size each commit and the
  * per-batch wall curve IS the state-commit cost as a function of
  * rows/partition.
  *
  * The shard count is the stateful operator's partition count, pinned
  * at query start from spark.sql.shuffle.partitions — the deployment
  * lever a frontier operator actually has (state is hash-partitioned
  * on the dedup key; raising the count splits every store).
  *
  * Usage: `runMain graft.tools.StreamStateBench [batchRows] [nBatches]
  * [shardList]` (defaults 100000, 20, "8,32,128"). Prints one JSON
  * line per shard config with per-batch walls and the final state
  * rows/partition.
  */
object StreamStateBench {
  def main(args: Array[String]): Unit = {
    val batchRows = args.headOption.map(_.toInt).getOrElse(100000)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(20)
    require(batchRows >= 1 && nBatches >= 3,
      s"need batchRows >= 1 and nBatches >= 3 (steady stats drop the " +
        s"first two batches), got $batchRows/$nBatches")
    val shards = args.drop(2).headOption.getOrElse("8,32,128")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def f3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

    shards.foreach { nShards =>
      val in = MemoryStream[(Timestamp, String)]
      // the explicit helper knob (0 = defaultStateParts = executor
      // cores, the deployment default this bench validated)
      val deduped = graft.streaming.Streams.urlDedup(
        in.toDF().toDF("ts", "url"), "url", watermark = "24 hours",
        stateParts = nShards)
      val ckpt = java.nio.file.Files
        .createTempDirectory(s"graft_statebench_$nShards").toString
      val q = deduped.writeStream.format("noop")
        .option("checkpointLocation", ckpt).start()
      val t0 = Timestamp.valueOf("2026-01-01 00:00:00")
      var next = 0L
      val walls = (1 to nBatches).map { _ =>
        val rows = (0 until batchRows).map { i =>
          (t0, s"https://ex${(next + i) % 997}.org/p/${next + i}")
        }
        next += batchRows
        in.addData(rows)
        val w0 = System.nanoTime()
        q.processAllAvailable()
        (System.nanoTime() - w0) / 1e9
      }
      val stateRows = q.lastProgress.stateOperators.asInstanceOf[Array[_]]
        .map(_.asInstanceOf[org.apache.spark.sql.streaming.StateOperatorProgress]
          .numRowsTotal).sum
      q.stop()
      val steady = walls.drop(2)
      val resolved = if (nShards > 0) nShards
        else graft.streaming.Streams.defaultStateParts(spark)
      println(s"""{"shards":$resolved,"batch_rows":$batchRows,""" +
        s""""n_batches":$nBatches,"state_rows":$stateRows,""" +
        s""""rows_per_partition":${stateRows / resolved},""" +
        s""""walls":[${walls.map(f3).mkString(",")}],""" +
        s""""steady_min":${f3(steady.min)},"steady_med":${f3(
          steady.sorted.apply(steady.size / 2))},""" +
        s""""last5_med":${f3(walls.takeRight(5).sorted.apply(2))}}""")
    }
    spark.stop()
  }
}
