package graft.tools

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Streaming-surface throughput bench (VERDICT r14 item 4): measures
  * the crawl-frontier composition warcIngest -> robotsGate -> langGate
  * -> urlDedup and the perceptual imageDedupAgainstIndex path over
  * MemoryStream micro-batches, reporting per-micro-batch wall, rows/s,
  * and the url-dedup state-store row count (the state-sizing datum).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... runMain graft.tools.StreamBench
  * [nBatches]` — blobs derive from the SF dir's documents table (10
  * responses per WARC file, every 4th record a gzip member, 1/8 of
  * paths robots-disallowed, every 5th doc fed twice to exercise the
  * dedup state); the image path streams near-dup/far PNG batches
  * against a freshly written 500-image dHash index. Prints one JSON
  * line; timings are per-batch walls around processAllAvailable.
  *
  * `SPARK_GRAFT_STREAM_PATHS=frontier,image,sessionize` (default all)
  * selects which paths run — the batch-size knee measurement (VERDICT
  * r15 item 5) sweeps the frontier alone at sf10-scale feeds, where
  * collecting the other paths' fixtures would only add noise. */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val nBatches = args.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val paths = sys.env.getOrElse("SPARK_GRAFT_STREAM_PATHS",
      "frontier,image,sessionize").split(",").map(_.trim).toSet
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // locale-pinned: f"%.3f" under a comma-decimal default locale would
    // render 0,123 and break the JSON consumer (ADVICE r15)
    def f3(x: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))

    // ---- crawl frontier: warcIngest -> robotsGate -> langGate ->
    // urlDedup. The language gate runs in AUDIT mode (keepRejected) so
    // its kernel cost is measured without changing row counts — the
    // synthetic corpus shares one vocabulary, so a filtering gate
    // would drop everything or nothing.
    val frontierJson = if (!paths("frontier")) None else Some {
      // fixture: WARC blobs from the documents table
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("doc_id"), col("text")).collect()
        .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      def urlOf(id: Long): String = {
        val host = s"www.ex${(id / 8) % 7}.com"
        val path = if (id % 8 == 3) s"/private/p/$id" else s"/p/$id"
        s"https://$host$path?gclid=$id"
      }
      // every 5th doc repeats (same canonical URL) — urlDedup state prey
      val feed = docs.flatMap { case (id, text) =>
        val once = Seq((id, text))
        if (id % 5 == 0) once ++ once else once
      }
      val blobs: Array[Array[Byte]] = feed.grouped(10).map { group =>
        group.zipWithIndex.flatMap { case ((id, text), i) =>
          val rec = graft.sources.Warc.encodeResponse(
            urlOf(id), "2026-08-15T00:00:00Z", 200, "OK",
            text.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          (if (i % 4 == 0) graft.sources.Warc.gzipMember(rec) else rec).toSeq
        }.toArray
      }.toArray
      val inBytes = blobs.map(_.length.toLong).sum

      val rules = graft.operators.Robots.parseRules(
        (0 until 7).map(h => (s"www.ex$h.com",
          "User-agent: GraftBot\nDisallow: /private/\n\n" +
            "User-agent: *\nDisallow: /\n")).toDF("host", "body"),
        "host", "body", "GraftBot")

      val in = MemoryStream[(Timestamp, Array[Byte])]
      var outRows = 0L
      // encoding + entropy gates run in AUDIT mode for the same reason
      // as the language gate: measure the kernel cost at full row flow
      val pipeline = Streams.urlDedup(
        Streams.langGate(
          Streams.entropyGate(
            Streams.encodingGate(
              Streams.robotsGate(
                Streams.warcIngest(in.toDF().toDF("ts", "bytes"), "bytes"),
                rules, "target_uri"),
              "body", keepRejected = true),
            "body", keepRejected = true),
          "body", allowed = Seq("en", "de", "es", "fr", "it", "pt", "nl"),
          keepRejected = true),
        "target_uri")
      val q = pipeline.writeStream
        .foreachBatch { (df: DataFrame, _: Long) => outRows += df.count() }
        .outputMode("append").start()
      val perBatch = blobs.grouped(math.max(1, blobs.length / nBatches)).toArray
      val walls = new Array[Double](perBatch.length)
      try {
        perBatch.zipWithIndex.foreach { case (chunk, bi) =>
          val ts = new Timestamp(1700000000000L + bi * 60000L)
          val t0 = System.nanoTime()
          in.addData(chunk.map(b => (ts, b)).toSeq)
          q.processAllAvailable()
          walls(bi) = (System.nanoTime() - t0) / 1e9
        }
      } finally q.stop()
      val stateRows = Option(q.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      val frontierWall = walls.sum
      val frontierRows = feed.length.toLong
      s""""frontier":{""" +
        s""""blobs":${blobs.length},"records_in":$frontierRows,""" +
        s""""bytes_in":$inBytes,"rows_out":$outRows,""" +
        s""""batches":${perBatch.length},"wall_sec":$frontierWall,""" +
        s""""rows_per_sec":${(frontierRows / frontierWall).toLong},""" +
        s""""batch_walls":[${walls.map(f3).mkString(",")}],""" +
        s""""state_rows":$stateRows}"""
    }

    // ---- image dedup vs persisted dHash index ----
    val imageJson = if (!paths("image")) None else Some {
      val (w0, h0) = (64, 48)
      // per-seed gradient STRUCTURE (not offset): dHash is brightness-
      // and shift-invariant, so only direction/frequency changes make
      // distinct corpus images
      def pix(seed: Long)(x: Int, y: Int): Int =
        ((x * (3 + seed % 13) + y * (11 + seed % 7) +
          (x * y * (1 + seed % 5)) / 16 + seed * 37) % 200).toInt
      def png(f: (Int, Int) => Int): Array[Byte] =
        graft.operators.Multimodal.ImageHeader.encodePngStored(w0, h0, f)
      val corpusN = 500
      val idx = s"/tmp/graft_sb_idx_${System.nanoTime()}"
      val out = s"/tmp/graft_sb_out_${System.nanoTime()}"
      val corpus = (0 until corpusN)
        .map(i => (i.toLong, "image", png(pix(i))))
        .toDF("media_id", "kind", "bytes")
      graft.operators.Multimodal.writeDHashIndex(corpus, idx)
      val imgIn = MemoryStream[(Long, Array[Byte])]
      val sink = Streams.imageDedupAgainstIndex(spark, idx, out, maxHamming = 8)
      val imgQ = imgIn.toDF().toDF("media_id", "bytes")
        .selectExpr("media_id", "'image' AS kind", "bytes")
        .writeStream.foreachBatch { (df: DataFrame, id: Long) => sink(df, id) }
        .outputMode("append").start()
      val imgBatches = 10
      val imgPerBatch = 100
      val imgWalls = new Array[Double](imgBatches)
      try {
        (0 until imgBatches).foreach { bi =>
          val batch = (0 until imgPerBatch).map { j =>
            val gid = (bi * imgPerBatch + j).toLong
            // half near-dups of a corpus image (corner-perturbed), half far
            val bytes =
              if (j % 2 == 0) png((x, y) => pix(gid % corpusN)(x, y) +
                (if (x < 8 && y < 8) 16 else 0))
              else png((x, y) => 255 - pix(gid)(x, y))
            (100000L + gid, bytes)
          }
          val t0 = System.nanoTime()
          imgIn.addData(batch)
          imgQ.processAllAvailable()
          imgWalls(bi) = (System.nanoTime() - t0) / 1e9
        }
      } finally imgQ.stop()
      val imgPairs = spark.read.parquet(out).count()
      s""""image_dedup":{"corpus":$corpusN,"streamed":${imgBatches * imgPerBatch},""" +
        s""""pairs":$imgPairs,"wall_sec":${imgWalls.sum},""" +
        s""""imgs_per_sec":${(imgBatches * imgPerBatch / imgWalls.sum).toLong},""" +
        s""""batch_walls":[${imgWalls.map(f3).mkString(",")}]}"""
    }

    // ---- stateful sessionization over the events table ----
    // session_window + watermark: the state-HEAVY streaming path (one
    // open session row per active user in state). Events feed in
    // event-time order split into batches; sessions close as the
    // watermark passes them.
    // ts normalization: fixtures carry TIMESTAMP(NANOS) (long ns under
    // nanosAsLong) or timestamp[us] (NTZ) — same handling as
    // queries/EventQueries.ev
    val sessJson = if (!paths("sessionize")) None else Some {
      val evRaw = spark.read.parquet(s"$sfDir/events.parquet")
      val evTs = evRaw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          evRaw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          evRaw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => evRaw
      }
      val evRows = evTs
        .selectExpr("user_id", "ts", "COALESCE(value, 0.0) AS value")
        .orderBy("ts")
        .collect()
        .map(r => (r.getLong(0), r.getTimestamp(1), r.getDouble(2)))
      val sessIn = MemoryStream[(Long, Timestamp, Double)]
      var sessRows = 0L
      val sessQ = Streams.sessionize(
          sessIn.toDF().toDF("user_id", "ts", "value"),
          gap = "30 minutes", watermark = "10 minutes")
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) => sessRows += df.count() }
        .outputMode("append").start()
      val evBatches = evRows.grouped(math.max(1, evRows.length / 10)).toArray
      val sessWalls = new Array[Double](evBatches.length)
      try {
        evBatches.zipWithIndex.foreach { case (chunk, bi) =>
          val t0 = System.nanoTime()
          sessIn.addData(chunk.toSeq)
          sessQ.processAllAvailable()
          sessWalls(bi) = (System.nanoTime() - t0) / 1e9
        }
      } finally sessQ.stop()
      val sessState = Option(sessQ.lastProgress)
        .map(_.stateOperators.map(_.numRowsTotal).sum).getOrElse(-1L)
      s""""sessionize":{"events_in":${evRows.length},""" +
        s""""sessions_out":$sessRows,"wall_sec":${sessWalls.sum},""" +
        s""""events_per_sec":${(evRows.length / sessWalls.sum).toLong},""" +
        s""""batch_walls":[${sessWalls.map(f3).mkString(",")}],""" +
        s""""state_rows":$sessState}"""
    }

    val sections = Seq(frontierJson, imageJson, sessJson).flatten
    println(s"""{"metric":"stream","sf":"$sfDir",""" + sections.mkString(",") + "}")
    spark.stop()
  }
}
