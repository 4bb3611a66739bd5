package graft.tools

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Streaming parity board (VERDICT r18 item 4): the r18 batch-parity
  * discipline applied to the streaming surface. Each stateful /
  * ingest-dedup helper is replayed under configurations that differ in
  * BOTH axes an operator controls in production —
  *
  *   (a) state-store partition count (fresh checkpoints each run, so
  *       the knob actually takes; adversarial values 3/5/8 on an
  *       8-core session), and
  *   (b) micro-batch slicing of the same event-time-ordered input
  *       (one giant batch vs ~5 vs ~20 micro-batches)
  *
  * — and every configuration's final output must be multiset-hash
  * identical, and identical to the batch twin where one exists
  * (sessionize/tumbling/dedup/urlDedup/cmsGrid/runningTotals: the
  * batch operator or an inline replica of the same expression chain;
  * ingest-dedup sinks: the batch function the sink wraps, applied to
  * the whole delta at once). Inputs are fed in event-time order —
  * the in-order-delivery contract under which watermark semantics
  * make outputs slicing-invariant; out-of-order delivery BEYOND the
  * watermark legitimately changes results and is not a parity axis.
  *
  * Writes one JSON object per helper to the output path; exit code 1
  * on any divergence. Usage:
  *   sbt 'runMain graft.tools.StreamParityBoard <sfDir> <outJson>'
  */
object StreamParityBoard {

  final case class Cfg(name: String, parts: Int, chunk: Int)
  val cfgs: Seq[Cfg] = Seq(
    Cfg("p3_one_batch", 3, Int.MaxValue),
    Cfg("p8_5_batches", 8, 2048),
    Cfg("p5_20_batches", 5, 512))

  private var qctr = 0

  /** Order-independent fingerprint: sort the canonical row strings,
    * SHA-256 the concatenation. */
  def msHash(df: DataFrame): (Long, String) = {
    val strs = df.collect().map(_.toSeq.map {
      case null => "∅"
      case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
      case x => x.toString
    }.mkString("|")).sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    strs.foreach(s => md.update(s.getBytes("UTF-8")))
    (strs.length.toLong, md.digest().map("%02x".format(_)).mkString.take(16))
  }

  /** Run a memory-sink streaming helper under one config: fresh
    * checkpoint, session shuffle conf = cfg.parts (the state-store
    * partition lever), input fed in `cfg.chunk`-row micro-batches in
    * the given order, optional far-future flush rows to close every
    * watermarked window, then hash the projected sink table. */
  def runMem[T <: Product : Encoder](spark: SparkSession, cfg: Cfg,
      rows: Seq[T], cols: Seq[String],
      build: DataFrame => DataFrame,
      project: DataFrame => DataFrame,
      flush: Seq[T] = Nil): (Long, String) = {
    spark.conf.set("spark.sql.shuffle.partitions", cfg.parts.toString)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[T]
    qctr += 1
    val qn = s"spb_$qctr"
    val ckpt = Files.createTempDirectory("spb_ckpt").toString
    val q = build(in.toDF().toDF(cols: _*))
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      rows.grouped(math.max(1, math.min(cfg.chunk, rows.size))).foreach { ch =>
        in.addData(ch); q.processAllAvailable()
      }
      if (flush.nonEmpty) { in.addData(flush); q.processAllAvailable() }
      msHash(project(spark.table(qn)))
    } finally {
      q.stop()
      spark.catalog.dropTempView(qn)
    }
  }

  /** Two-input variant of [[runMem]] for stream-stream joins: both
    * sides are MemoryStreams fed in alternating `cfg.chunk`-row
    * micro-batches (left chunk, right chunk, drain — the interleaving
    * a real two-topic consumer produces), then the sink is hashed.
    * Inner-join matches emit as soon as both sides hold the rows, so
    * no flush is needed for completeness. */
  def runMem2[A <: Product : Encoder, B <: Product : Encoder](
      spark: SparkSession, cfg: Cfg,
      lRows: Seq[A], lCols: Seq[String],
      rRows: Seq[B], rCols: Seq[String],
      build: (DataFrame, DataFrame) => DataFrame,
      project: DataFrame => DataFrame): (Long, String) = {
    spark.conf.set("spark.sql.shuffle.partitions", cfg.parts.toString)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val lIn = MemoryStream[A]
    val rIn = MemoryStream[B]
    qctr += 1
    val qn = s"spb_$qctr"
    val ckpt = Files.createTempDirectory("spb_ckpt").toString
    val q = build(lIn.toDF().toDF(lCols: _*), rIn.toDF().toDF(rCols: _*))
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      val chunk = math.max(1, math.min(cfg.chunk,
        math.max(lRows.size, rRows.size)))
      val lChunks = lRows.grouped(chunk).toSeq
      val rChunks = rRows.grouped(chunk).toSeq
      (0 until math.max(lChunks.size, rChunks.size)).foreach { i =>
        if (i < lChunks.size) lIn.addData(lChunks(i))
        if (i < rChunks.size) rIn.addData(rChunks(i))
        q.processAllAvailable()
      }
      msHash(project(spark.table(qn)))
    } finally {
      q.stop()
      spark.catalog.dropTempView(qn)
    }
  }

  /** Run a foreachBatch ingest-dedup sink under one config and hash
    * the projected parquet it writes (minus the `__batch` partition
    * column, which legitimately differs with slicing). */
  def runSink[T <: Product : Encoder](spark: SparkSession, cfg: Cfg,
      rows: Seq[T], cols: Seq[String],
      prep: DataFrame => DataFrame,
      sink: String => (DataFrame, Long) => Unit,
      project: DataFrame => DataFrame): (Long, String) = {
    spark.conf.set("spark.sql.shuffle.partitions", cfg.parts.toString)
    implicit val ctx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[T]
    qctr += 1
    val out = Files.createTempDirectory(s"spb_out_$qctr").toString + "/pairs"
    val ckpt = Files.createTempDirectory("spb_ckpt").toString
    val q = prep(in.toDF().toDF(cols: _*))
      .writeStream.foreachBatch(sink(out)).outputMode("append")
      .option("checkpointLocation", ckpt).start()
    try {
      rows.grouped(math.max(1, math.min(cfg.chunk, rows.size))).foreach { ch =>
        in.addData(ch); q.processAllAvailable()
      }
      msHash(project(spark.read.parquet(out).drop("__batch")))
    } finally q.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // ---- shared inputs: the sf events table, event-time-ordered ----
    val evRows: Seq[(Long, Timestamp, Long, String, Double)] =
      spark.read.parquet(s"$sfDir/events.parquet")
        .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
          col("user_id"), col("event_type"), col("value"))
        .orderBy("ts", "event_id").collect().toSeq.map { r =>
          (r.getLong(0), r.getTimestamp(1), r.getLong(2),
            if (r.isNullAt(3)) "" else r.getString(3),
            if (r.isNullAt(4)) 0.0 else r.getDouble(4))
        }
    val evCols = Seq("event_id", "ts", "user_id", "event_type", "value")
    val maxTs = evRows.map(_._2.getTime).max
    val flushEv = Seq((999999L,
      new Timestamp(maxTs + 30L * 24 * 3600 * 1000), 999999L, "flush", 0.0))
    def evBatch: DataFrame = evRows.toDF(evCols: _*)

    val results = scala.collection.mutable.LinkedHashMap
      .empty[String, (Seq[(String, (Long, String))], Option[(Long, String)])]
    def record(name: String,
        runs: Seq[(String, (Long, String))],
        twin: Option[(Long, String)]): Unit = {
      results(name) = (runs, twin)
      val hs = runs.map(_._2._2).distinct
      val ok = hs.size == 1 && twin.forall(_._2 == hs.head)
      println(s"[$name] ${if (ok) "EQUAL" else "DIVERGED"} " +
        runs.map { case (c, (n, h)) => s"$c=$n/$h" }.mkString(" ") +
        twin.map { case (n, h) => s" twin=$n/$h" }.getOrElse(""))
    }

    // ---- 1. sessionize (gap windows, watermark-closed) ----
    record("sessionize", cfgs.map { c =>
      c.name -> runMem(spark, c, evRows, evCols,
        df => Streams.sessionize(df.select(col("user_id"), col("ts"),
          col("value")), gap = "30 minutes", watermark = "10 minutes",
          stateParts = c.parts),
        identity[DataFrame], flush = flushEv)
    }, Some(msHash(graft.operators.Events.sessionize(
      evBatch, "user_id", "ts", "value", "30 minutes"))))

    // ---- 2. tumblingCounts (1h windows) ----
    def tumbProject(df: DataFrame): DataFrame = df
    record("tumblingCounts", cfgs.map { c =>
      c.name -> runMem(spark, c, evRows, evCols,
        df => Streams.tumblingCounts(df.select(col("user_id"), col("ts"),
          col("value")), width = "1 hour", watermark = "10 minutes"),
        tumbProject, flush = flushEv)
    }, Some(msHash(evBatch
      .groupBy(window(col("ts"), "1 hour"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("value_milli")))))

    // ---- 3. dedupByKey (exact duplicates planted adjacently) ----
    val dupRows = evRows.flatMap(e =>
      if (e._1 % 7 == 0) Seq(e, e) else Seq(e))
    def dedupProject(df: DataFrame): DataFrame =
      df.select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"),
        round(col("value") * 1000).cast("long").as("value_milli"))
    record("dedupByKey", cfgs.map { c =>
      c.name -> runMem(spark, c, dupRows, evCols,
        df => Streams.dedupByKey(df, "event_id", watermark = "1 hour"),
        dedupProject)
    }, Some(msHash(dedupProject(
      dupRows.toDF(evCols: _*).dropDuplicates("event_id")))))

    // ---- 4. urlDedup (canonical-form dedup; first arrival wins) ----
    val urlRows: Seq[(Timestamp, String)] = evRows.map { e =>
      val id = e._1
      val base = s"https://Site${id % 37}.example.com/p/${id % 211}"
      val u = (id % 4) match {
        case 0 => base
        case 1 => base + "?utm_source=feed"
        case 2 => base + "#section"
        case _ => base + "?b=2&a=1"
      }
      (e._2, u)
    }
    def urlProject(df: DataFrame): DataFrame =
      df.groupBy(col("canonical_url"))
        .agg(min(unix_micros(col("ts"))).as("first_us"))
    record("urlDedup", cfgs.map { c =>
      c.name -> runMem(spark, c, urlRows, Seq("ts", "url"),
        df => Streams.urlDedup(df, "url", watermark = "1 hour",
          stateParts = c.parts),
        urlProject)
    }, Some(msHash(urlRows.toDF("ts", "url")
      .withColumn("canonical_url",
        graft.operators.CorpusMix.canonicalUrl(col("url")))
      .groupBy(col("canonical_url"))
      .agg(min(unix_micros(col("ts"))).as("first_us")))))

    // ---- 5. cmsGrid (sketch cells per closed window) ----
    record("cmsGrid", cfgs.map { c =>
      c.name -> runMem(spark, c, evRows, evCols,
        df => Streams.cmsGrid(df.select(col("ts"), col("user_id")),
          "user_id", width = "1 hour", watermark = "10 minutes",
          depth = 4, w = 512, stateParts = c.parts),
        identity[DataFrame], flush = flushEv)
    }, Some {
      // inline batch replica of the same deterministic bucket streams
      import graft.functions.hashes.lehmer3
      val key = col("user_id").cast("long")
      msHash(evBatch
        .select(col("ts"), explode(array((0 until 4).map(i =>
          struct(lit(i).as("i"),
            pmod(lehmer3(key + lit(i * 1000003L)), lit(512L)).as("b"))): _*))
          .as("ib"))
        .groupBy(window(col("ts"), "1 hour"), col("ib.i"), col("ib.b"))
        .agg(count(lit(1)).as("c"))
        .select(unix_micros(col("window.start")).as("window_start_us"),
          col("i"), col("b"), col("c")))
    })

    // ---- 6. runningTotals (flatMapGroupsWithState) ----
    // append emits one running row per input row; the slicing-invariant
    // object is the FINAL per-user total (count and sum are
    // order-insensitive; intermediate prefix rows are not)
    val totRows: Seq[(Long, Timestamp, Double)] =
      evRows.map(e => (e._3, e._2, e._5))
    def totProject(df: DataFrame): DataFrame =
      df.groupBy(col("user_id"))
        .agg(max(col("n_events")).as("n_events"),
          max_by(col("value_milli"), col("n_events")).as("value_milli"))
    record("runningTotals", cfgs.map { c =>
      c.name -> runMem(spark, c, totRows, Seq("user_id", "ts", "value"),
        df => Streams.runningTotals(df.as[Streams.Ev]).toDF(),
        totProject)
    }, Some(msHash(totRows.toDF("user_id", "ts", "value")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli")))))

    // ---- 7. text ingest-dedup against the persisted near-dup index ----
    val docRows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val corpus = docRows.take(300)
    val idxDir = Files.createTempDirectory("spb_txt_idx").toString
    graft.operators.Dedup.writeNearDupIndex(
      corpus.toDF("doc_id", "text"), "doc_id", "text", idxDir)
    // delta: near-copies of 20 indexed docs (one word changed) + 40 fresh
    val delta: Seq[(Long, String)] =
      corpus.slice(280, 300).map { case (id, t) =>
        (10000L + id, t.replaceFirst("\\b\\w+\\b", "graftzz")) } ++
      docRows.slice(300, 340)
    val deltaCfgs = Seq(
      Cfg("p3_one_batch", 3, Int.MaxValue),
      Cfg("p8_4_batches", 8, 15),
      Cfg("p5_12_batches", 5, 5))
    def pairProject(df: DataFrame): DataFrame = df.select("in_id", "corpus_id")
    record("textDedupIngest", deltaCfgs.map { c =>
      c.name -> runSink(spark, c, delta, Seq("doc_id", "text"),
        identity[DataFrame],
        out => Streams.nearDupAgainstIndex(spark, idxDir, out,
          "doc_id", "text", threshold = 0.5),
        pairProject)
    }, Some(msHash(pairProject(graft.operators.Dedup.nearDupsAgainstIndex(
      spark, idxDir, delta.toDF("doc_id", "text"), "doc_id", "text",
      threshold = 0.5)))))

    // ---- 8. image ingest-dedup against the persisted dHash index ----
    val (w, h) = (32, 24)
    def shade(seed: Int)(x: Int, y: Int): Int =
      (x * (3 + seed * 2) + y * (11 + seed * 3)) % 200
    def png(f: (Int, Int) => Int): Array[Byte] =
      graft.operators.Multimodal.ImageHeader.encodePngStored(w, h, f)
    val imgCorpus = (0 until 6).map(s =>
      (100L + s, "image", png(shade(s))))
    val imgIdx = Files.createTempDirectory("spb_img_idx").toString
    graft.operators.Multimodal.writeDHashIndex(
      imgCorpus.toDF("media_id", "kind", "bytes"), imgIdx)
    val imgDelta: Seq[(Long, Array[Byte])] =
      (0 until 3).map(s => (1L + s,
        png((x, y) => shade(s)(x, y) + (if (x < 8 && y < 8) 16 else 0)))) ++
      Seq((4L, graft.operators.Multimodal.ImageHeader.encodeGif(w, h, shade(3)))) ++
      (0 until 2).map(s => (5L + s, png((x, y) => 255 - shade(s)(x, y))))
    val mediaCfgs = Seq(
      Cfg("p3_one_batch", 3, Int.MaxValue),
      Cfg("p8_2_batches", 8, 3),
      Cfg("p5_row_batches", 5, 1))
    def addKind(kind: String)(df: DataFrame): DataFrame =
      df.selectExpr("media_id", s"'$kind' AS kind", "bytes")
    record("imageDedupIngest", mediaCfgs.map { c =>
      c.name -> runSink(spark, c, imgDelta, Seq("media_id", "bytes"),
        addKind("image"),
        out => Streams.imageDedupAgainstIndex(spark, imgIdx, out,
          maxHamming = 8),
        pairProject)
    }, Some(msHash(pairProject(
      graft.operators.Multimodal.imageNearDupsAgainstIndex(spark, imgIdx,
        addKind("image")(imgDelta.toDF("media_id", "bytes")), 8)))))

    // ---- 9. video ingest-dedup against the signature index ----
    val mults = Array((3, 5), (7, 11), (13, 17))
    def frame(s: Int, wig: Int, mx0: Int = -1, my0: Int = -1): Array[Byte] = {
      val (mx, my) = if (mx0 > 0) (mx0, my0) else mults(s)
      graft.operators.JpegCodec.encodeJpegDcOnly(72, 64,
        (bx, by) => 20 + s * 70 + (bx * mx + by * my) % 50 + wig)
    }
    def avi(frames: Seq[Array[Byte]], us: Int = 33000): Array[Byte] =
      graft.sources.Avi.encodeMjpeg(72, 64, us, frames)
    val vidCorpus = Seq(
      (100L, "image", avi((0 until 3).flatMap(s => Seq(frame(s, 0), frame(s, 1))))),
      (101L, "image", avi((0 until 3).flatMap(s =>
        Seq(frame(s, 0, 19, 23), frame(s, 1, 19, 23))))))
    val vidIdx = Files.createTempDirectory("spb_vid_idx").toString
    graft.operators.Multimodal.writeVideoSignatureIndex(
      vidCorpus.toDF("media_id", "kind", "bytes"), vidIdx)
    val vidDelta: Seq[(Long, Array[Byte])] = Seq(
      (1L, avi((1 until 3).flatMap(s => Seq(frame(s, 0), frame(s, 1))), 40000)),
      (2L, avi((0 until 3).flatMap(s =>
        Seq(frame(s, 0, 23, 29), frame(s, 1, 23, 29))))),
      (3L, avi((0 until 3).flatMap(s => Seq(frame(s, 0), frame(s, 1))))))
    def vidProject(df: DataFrame): DataFrame =
      df.select("in_id", "corpus_id", "n_shared_scenes")
    record("videoDedupIngest", mediaCfgs.map { c =>
      c.name -> runSink(spark, c, vidDelta, Seq("media_id", "bytes"),
        addKind("image"),
        out => Streams.videoDedupAgainstIndex(spark, vidIdx, out),
        vidProject)
    }, Some(msHash(vidProject(
      graft.operators.Multimodal.videoNearDupsAgainstIndex(spark, vidIdx,
        addKind("image")(vidDelta.toDF("media_id", "bytes")))))))

    // ---- 10. audio ingest-dedup against the fingerprint index ----
    def rec(seed: Int, n: Int): Array[Int] =
      Array.tabulate(n)(k => ((seed * 23 + k * 11) % 4096) - 2048)
    val recA = rec(7, 1500); val recB = rec(19, 1100)
    val audCorpus = Seq(
      (100L, "audio",
        graft.operators.Multimodal.WavCodec.encodePcm16(16000, recA)),
      (101L, "audio", graft.sources.Flac.encode(recB, blockSize = 512)))
    val audIdx = Files.createTempDirectory("spb_aud_idx").toString
    graft.operators.Multimodal.writeAudioFpIndex(
      audCorpus.toDF("media_id", "kind", "bytes"), audIdx)
    val audDelta: Seq[(Long, Array[Byte])] = Seq(
      (1L, graft.sources.Flac.encode(recA, blockSize = 512)),
      (2L, graft.operators.Multimodal.WavCodec.encodePcm16(16000,
        recB.map(_ / 2))),
      (3L, graft.operators.Multimodal.WavCodec.encodePcm16(16000, rec(42, 900))))
    record("audioDedupIngest", mediaCfgs.map { c =>
      c.name -> runSink(spark, c, audDelta, Seq("media_id", "bytes"),
        addKind("audio"),
        out => Streams.audioDedupAgainstIndex(spark, audIdx, out),
        pairProject)
    }, Some(msHash(pairProject(
      graft.operators.Multimodal.audioDupsAgainstIndex(spark, audIdx,
        addKind("audio")(audDelta.toDF("media_id", "bytes")))))))

    // ---- 11. the five frontier gates (r21, VERDICT r20 item 9) ----
    // stateless by contract: partition count and micro-batch slicing
    // must be invisible, and the batch twin is the SAME function
    // applied to the batch frame (audit shapes keep every row)
    val gateDocs = docRows.take(400)
    record("encodingGate", cfgs.map { c =>
      c.name -> runMem(spark, c, gateDocs, Seq("doc_id", "text"),
        df => Streams.encodingGate(df, "text", keepRejected = true),
        identity[DataFrame])
    }, Some(msHash(Streams.encodingGate(
      gateDocs.toDF("doc_id", "text"), "text", keepRejected = true))))
    record("langGate", cfgs.map { c =>
      c.name -> runMem(spark, c, gateDocs, Seq("doc_id", "text"),
        df => Streams.langGate(df, "text", Seq("en"), keepRejected = true),
        identity[DataFrame])
    }, Some(msHash(Streams.langGate(
      gateDocs.toDF("doc_id", "text"), "text", Seq("en"),
      keepRejected = true))))
    val gateWeights = graft.operators.TextStats.classifierTrain(
      gateDocs.toDF("doc_id", "text").withColumn("label",
        (length(col("text")) % 2 === 0).cast("int")),
      "doc_id", "text", "label", numBuckets = 128, rounds = 3)
    record("qualityGate", cfgs.map { c =>
      c.name -> runMem(spark, c, gateDocs, Seq("doc_id", "text"),
        df => Streams.qualityGate(df, "text", gateWeights,
          keepRejected = true),
        identity[DataFrame])
    }, Some(msHash(Streams.qualityGate(
      gateDocs.toDF("doc_id", "text"), "text", gateWeights,
      keepRejected = true))))
    record("entropyGate", cfgs.map { c =>
      c.name -> runMem(spark, c, gateDocs, Seq("doc_id", "text"),
        df => Streams.entropyGate(df, "text", keepRejected = true),
        identity[DataFrame])
    }, Some(msHash(Streams.entropyGate(
      gateDocs.toDF("doc_id", "text"), "text", keepRejected = true))))
    val robotsBodies = Seq(
      ("a.ex", "User-agent: GraftBot\nDisallow: /g/\nAllow: /g/ok\n" +
        "User-agent: *\nDisallow: /\n"),
      ("b.ex", "User-agent: *\nDisallow: /*.tmp$\n"))
      .toDF("rhost", "body")
    val robotsRules = graft.operators.Robots.parseRules(
      robotsBodies, "rhost", "body", "GraftBot")
    val gateUrls: Seq[(Long, String)] = gateDocs.map { case (id, _) =>
      val host = Seq("a.ex", "b.ex", "c.ex")(
        (id % 3).toInt)
      val path = (id % 4) match {
        case 0 => s"/g/secret$id"
        case 1 => s"/g/ok$id"
        case 2 => s"/x$id.tmp"
        case _ => s"/free$id"
      }
      (id, s"https://$host$path")
    }
    record("robotsGate", cfgs.map { c =>
      c.name -> runMem(spark, c, gateUrls, Seq("doc_id", "url"),
        df => Streams.robotsGate(df, robotsRules, "url",
          keepDisallowed = true),
        identity[DataFrame])
    }, Some(msHash(Streams.robotsGate(
      gateUrls.toDF("doc_id", "url"), robotsRules, "url",
      keepDisallowed = true))))

    // ---- 12. warcIngestQuarantine (stateless flatMap; bad blobs
    // surface as quarantine rows, never poison the batch) ----
    val warcBlobs: Seq[(Timestamp, Array[Byte])] =
      evRows.take(60).zipWithIndex.map { case (e, i) =>
        val blob =
          if (i % 5 == 4) s"NOT A WARC $i".getBytes("UTF-8")
          else graft.sources.Warc.encodeResponse(
            s"https://ex.com/p$i", "2026-01-01T00:00:00Z", 200, "OK",
            s"body text $i ${"x" * (i % 7)}".getBytes("UTF-8"))
        (e._2, blob)
      }
    def warcProject(df: DataFrame): DataFrame =
      df.select(col("target_uri"), col("http_status"),
        col("content_length"), col("body"), col("quarantined"),
        col("q_offset"), col("q_reason"))
    record("warcIngestQuarantine", cfgs.map { c =>
      c.name -> runMem(spark, c, warcBlobs, Seq("ts", "bytes"),
        df => Streams.warcIngestQuarantine(df, "bytes"),
        warcProject)
    }, Some(msHash(warcProject(Streams.warcIngestQuarantine(
      warcBlobs.toDF("ts", "bytes"), "bytes")))))

    // ---- 13. fkOrphanCounts (stream-static left join + windowed agg) ----
    val dimUsers = evRows.map(_._3).distinct.filter(_ % 3 != 0)
      .toDF("user_id") // every user_id % 3 == 0 event is an orphan
    def fkProject(df: DataFrame): DataFrame =
      df.select(unix_micros(col("w_start")).as("w_us"),
        col("n_orphans"), col("n_null_keys"), col("approx_keys"))
    record("fkOrphanCounts", cfgs.map { c =>
      c.name -> runMem(spark, c, evRows, evCols,
        df => Streams.fkOrphanCounts(df, "user_id", dimUsers, "user_id"),
        fkProject, flush = flushEv)
    }, Some {
      // inline batch replica of the same join + windowed aggregate.
      // The twin aggregates the REAL rows only: the flush row exists
      // to advance the stream's watermark, and its own far-future
      // window never closes, so append mode never emits it
      val all = evRows.toDF(evCols: _*)
      val parents = dimUsers.select(col("user_id").as("__k"))
        .distinct().withColumn("__hit", lit(1))
      val isOrphan = col("__k").isNotNull && col("__hit").isNull
      msHash(all.select(col("ts"), col("user_id").as("__k"))
        .join(parents, Seq("__k"), "left")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(when(isOrphan, lit(1))).as("n_orphans"),
          count(when(col("__k").isNull, lit(1))).as("n_null_keys"),
          approx_count_distinct(when(isOrphan, col("__k")))
            .as("approx_keys"))
        .select(unix_micros(col("window.start")).as("w_us"),
          col("n_orphans"), col("n_null_keys"), col("approx_keys")))
    })

    // ---- 14. domainTokenCounts (windowed per-domain accounting) ----
    val domRows: Seq[(Timestamp, String, String)] = evRows.map { e =>
      (e._2, s"https://site${e._3 % 13}.example.com/p/${e._1 % 97}",
        s"some words here ${e._4} ${"tok " * (e._1 % 9).toInt}")
    }
    val domFlush = Seq((flushEv.head._2, "https://flush.example.com/x", "f"))
    def domProject(df: DataFrame): DataFrame =
      df.select(unix_micros(col("w_start")).as("w_us"), col("domain"),
        col("n_docs"), col("sum_tokens"))
    record("domainTokenCounts", cfgs.map { c =>
      c.name -> runMem(spark, c, domRows, Seq("ts", "url", "text"),
        df => Streams.domainTokenCounts(df, "url", "text"),
        domProject, flush = domFlush)
    }, Some {
      // flush row excluded: its window never closes (see fkOrphanCounts)
      val all = domRows.toDF("ts", "url", "text")
      msHash(all.select(col("ts"),
          graft.operators.CorpusMix.registrableDomain(col("url"))
            .as("domain"),
          graft.operators.CorpusMix.wsTokenCount(col("text")).as("__t"))
        .groupBy(window(col("ts"), "1 hour"), col("domain"))
        .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("sum_tokens"))
        .select(unix_micros(col("window.start")).as("w_us"), col("domain"),
          col("n_docs"), col("sum_tokens")))
    })

    // ---- 15. knScore (stateless row-local scoring vs the batch op) ----
    val knModel = graft.operators.TextStats.knTrain(
      docRows.take(300).toDF("doc_id", "text"), "text")
    val knLm = graft.operators.TextStats.knTable(knModel)
    val knDelta = docRows.slice(300, 360)
    record("knScore", cfgs.map { c =>
      c.name -> runMem(spark, c, knDelta, Seq("doc_id", "text"),
        df => Streams.knScore(df, "doc_id", "text", knLm),
        identity[DataFrame])
    }, Some(msHash(graft.operators.TextStats.knScoreWithTable(
      knDelta.toDF("doc_id", "text"), "doc_id", "text", knLm))))

    // ---- 16. intervalJoin (stream-stream, two watermarked sides) ----
    val clicks: Seq[(Long, Timestamp)] = evRows.map(e => (e._3, e._2))
    val purchases: Seq[(Long, Timestamp)] = evRows.zipWithIndex
      .collect { case (e, i) if i % 3 == 0 =>
        (e._3, new Timestamp(e._2.getTime + 600000L)) }
    record("intervalJoin", cfgs.map { c =>
      c.name -> runMem2(spark, c, clicks, Seq("user_id", "ts"),
        purchases, Seq("user_id", "ts"),
        (l, r) => Streams.intervalJoin(l, r, "user_id",
          horizon = "1 hour", watermark = "10 minutes"),
        df => df.select(col("user_id"), unix_micros(col("l_ts")),
          unix_micros(col("r_ts"))))
    }, Some {
      val l = clicks.toDF("user_id", "l_ts")
      val r = purchases.toDF("user_id", "r_ts")
      msHash(l.join(r, Seq("user_id"))
        .filter(col("r_ts") >= col("l_ts") &&
          col("r_ts") <= col("l_ts") + expr("INTERVAL 1 hour"))
        .select(col("user_id"), unix_micros(col("l_ts")),
          unix_micros(col("r_ts"))))
    })

    // ---- write board + verdict ----
    val rows = results.map { case (name, (runs, twin)) =>
      val hs = runs.map(_._2._2).distinct
      val equal = hs.size == 1 && twin.forall(_._2 == hs.head)
      val cfgJson = runs.map { case (c, (n, hsh)) =>
        s""""$c":{"rows":$n,"hash":"$hsh"}""" }.mkString("{", ",", "}")
      val twinJson = twin
        .map { case (n, hsh) => s"""{"rows":$n,"hash":"$hsh"}""" }
        .getOrElse("null")
      s""""$name":{"equal":$equal,"configs":$cfgJson,"batch_twin":$twinJson}"""
    }
    val allEqual = results.forall { case (_, (runs, twin)) =>
      val hs = runs.map(_._2._2).distinct
      hs.size == 1 && twin.forall(_._2 == hs.head)
    }
    Files.writeString(Paths.get(outPath),
      rows.mkString(s"""{"all_equal":$allEqual,\n""", ",\n", "\n}\n"))
    println(s"[stream-parity] all_equal=$allEqual -> $outPath")
    spark.stop()
    if (!allEqual) sys.exit(1)
  }
}
