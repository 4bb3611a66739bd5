package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming forms of the engine's event/document operators.
  * Each takes a *streaming* DataFrame (from readStream) and returns the
  * transformed streaming DataFrame — callers pick the sink. The batch
  * forms in [[graft.operators.Events]] use the same session_window /
  * window calls, so logic is shared by construction.
  *
  * Watermarks bound state: every stateful shape here ties its state
  * eviction to event-time progress, which is what lets these run
  * indefinitely at scale (no unbounded keys in memory).
  */
object Streams {

  /** The measured frontier default for state-store partitioning
    * (BENCH_STREAM round-17, VERDICT r17 item 5): state partitions
    * should track the ACTIVE EXECUTOR CORES, not state size — each
    * extra store on a host costs ~15-20 ms/batch of fixed commit
    * overhead (delta create+fsync per store per batch) while the
    * state-growth term stays shallow through 625k rows/partition, so
    * "one store per core" buys full commit parallelism at minimum
    * store count. */
  def defaultStateParts(spark: org.apache.spark.sql.SparkSession): Int =
    spark.sparkContext.defaultParallelism

  /** Pin the session's shuffle-partition conf — the ONLY lever Spark
    * exposes for a stateful query's state-store partition count,
    * resolved from the session at FIRST query start and immutable per
    * checkpoint thereafter. A TRUE NO-OP unless the caller passes an
    * explicit `stateParts > 0` (ADVICE r18: the old behavior resolved
    * the 0 default through [[defaultStateParts]] and so EVERY stream
    * build silently reconfigured the whole session's batch
    * shuffle-partition count as a side effect; now the default leaves
    * the session conf untouched and an operator opts in per query,
    * typically with `defaultStateParts(spark)` — the measured
    * optimum). One value per query: the last helper called before
    * `.start()` wins for the whole query. NOTE an explicit pin is a
    * SESSION-level conf set (there is no per-query form): batch work
    * planned afterwards in the same session inherits it — a mixed
    * batch+stream session that wants a different batch
    * shuffle-partition count should restore the conf after starting
    * the stream, or build the stream from `spark.newSession()`. */
  private def pinStateParts(df: DataFrame, stateParts: Int): Unit =
    if (stateParts > 0)
      df.sparkSession.conf.set("spark.sql.shuffle.partitions",
        stateParts.toString)

  /** Fail-loudly guard for the per-checkpoint IMMUTABILITY of the
    * state partition count (the operational footgun BENCH_STREAM r17
    * flagged): Spark pins `spark.sql.shuffle.partitions` into the
    * checkpoint's offsets metadata at first start and every restart
    * silently REUSES the pinned value — an operator who "reshards" by
    * changing the knob and replaying the checkpoint changes nothing
    * and gets no warning. Call this before restarting a frontier
    * query with an explicit knob: it reads the latest offsets
    * metadata and throws if the requested count differs from the
    * pinned one (start a NEW checkpoint to reshard). No-op on a fresh
    * checkpoint. The checkpoint is resolved through Hadoop's
    * FileSystem (ADVICE r18), so hdfs:// and s3a:// checkpoints — the
    * normal production case — are actually inspected rather than
    * silently skipped by a local-file stat; an offsets dir that
    * exists but cannot be listed/read fails loudly instead of
    * returning false assurance. `stateParts <= 0` resolves to the
    * session's CURRENT shuffle-partition conf — exactly what a query
    * started without an explicit pin would get. */
  def requireStatePartsCompatible(spark: org.apache.spark.sql.SparkSession,
      checkpointDir: String, stateParts: Int): Unit = {
    val resolved = if (stateParts > 0) stateParts
      else spark.sessionState.conf.numShufflePartitions
    val off = new org.apache.hadoop.fs.Path(checkpointDir, "offsets")
    val fs = off.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(off)) return
    val latest =
      try fs.listStatus(off).toSeq
        .filter(s => s.isFile && s.getPath.getName.forall(_.isDigit))
        .sortBy(_.getPath.getName.toLong).lastOption
      catch {
        case e: java.io.IOException => throw new IllegalStateException(
          s"checkpoint $checkpointDir has an offsets dir that cannot " +
            "be listed — refusing to vouch for state-partition " +
            "compatibility. Fix access or start a new checkpoint.", e)
      }
    latest.foreach { f =>
      val in = fs.open(f.getPath)
      val txt =
        try {
          val buf = new java.io.ByteArrayOutputStream()
          org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 65536, false)
          new String(buf.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
        } finally in.close()
      val m = """"spark\.sql\.shuffle\.partitions"\s*:\s*"?(\d+)"?""".r
        .findFirstMatchIn(txt)
      if (m.isEmpty) throw new IllegalStateException(
        s"checkpoint $checkpointDir offsets metadata (${f.getPath}) " +
          "carries no spark.sql.shuffle.partitions entry — cannot " +
          "verify state-partition compatibility; refusing to vouch.")
      m.foreach { mm =>
        val pinned = mm.group(1).toInt
        if (pinned != resolved) throw new IllegalStateException(
          s"checkpoint $checkpointDir pins $pinned state partitions; " +
            s"requested $resolved. State-partition count is immutable " +
            "per checkpoint — a restart would silently run with " +
            s"$pinned. Start a new checkpoint to reshard.")
      }
    }
  }

  /** Per-event typed view for custom-state operators. */
  final case class Ev(user_id: Long, ts: Timestamp, value: Double)

  /** Running per-user totals carried across micro-batches. */
  final case class UserRunning(user_id: Long, n_events: Long, value_milli: Long)

  /** Gap-based streaming sessionization (same semantics as the batch
    * Events.sessionize): emits closed sessions once the watermark
    * passes their end. An explicit `stateParts > 0` pins the
    * state-store partition count at first start (immutable per
    * checkpoint — [[requireStatePartsCompatible]]); pass
    * [[defaultStateParts]] for the measured optimum. The 0 default
    * leaves the session conf untouched. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes", stateParts: Int = 0): DataFrame = {
    pinStateParts(events, stateParts)
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("value_milli"))
  }

  /** Tumbling event-time counts with a watermark (append-ready). */
  def tumblingCounts(events: DataFrame, width: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width))
      .agg(count(lit(1)).as("n_events"),
        sum(round(col("value") * 1000).cast("long")).as("value_milli"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("n_events"), col("value_milli"))

  /** Streaming exact dedup on an id column: state bounded by the
    * watermark (late duplicates beyond it age out of state — the
    * standard scale/correctness trade). */
  def dedupByKey(events: DataFrame, keyCol: String,
      watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(keyCol)

  /** Streaming URL-level dedup on the CANONICAL form — the crawl
    * frontier's first filter, online: the same codegen'd
    * [[graft.operators.CorpusMix.canonicalUrl]] chain as the batch op
    * (backfill and stream agree key-for-key), then
    * dropDuplicatesWithinWatermark on the canonical key, state bounded
    * by the watermark like [[dedupByKey]]. Returns the input columns
    * plus `canonical_url`. */
  def urlDedup(stream: DataFrame, urlCol: String,
      watermark: String = "1 hour", stateParts: Int = 0): DataFrame = {
    pinStateParts(stream, stateParts)
    stream.withColumn("canonical_url",
        graft.operators.CorpusMix.canonicalUrl(col(urlCol)))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("canonical_url")
  }

  /** Streaming robots.txt compliance gate — the online form of
    * [[graft.operators.Robots]] and the crawl frontier's OTHER first
    * filter (with [[urlDedup]]): the rule table is STATIC (parsed
    * once from the robots corpus via `Robots.parseRules`, rebuilt on
    * a robots re-crawl), joined into every micro-batch as the
    * broadcast side of a stream-static join, so the stream side keeps
    * the batch op's zero-exchange scan -> broadcast-join -> array_max
    * shape and disallowed URLs drop AT THE FRONTIER — before fetch
    * bytes, parse CPU, or state is spent on them. Stateless: no
    * watermark, no state store; backfill and stream decide
    * identically by construction (same rules frame, same kernel).
    * `keepDisallowed = true` emits every row with its decision
    * columns instead of filtering — the audit shape. */
  def robotsGate(stream: DataFrame, rules: DataFrame, urlCol: String,
      keepDisallowed: Boolean = false): DataFrame = {
    val d = graft.operators.Robots.withDecision(stream, rules, urlCol)
    if (keepDisallowed) d else d.filter(col("allowed"))
  }

  /** Streaming language gate — the frontier filter after [[robotsGate]]
    * in a multilingual curation pipeline: predict each document's
    * language with the single-pass trigram kernel
    * ([[graft.operators.TextStats.withLangScores]] /
    * [[graft.functions.LangKernels]]) and keep rows whose `pred_lang`
    * is in `allowed`. STATELESS (no watermark, no state store, the
    * profile tables ride inside the codegen'd expression) — backfill
    * and stream decide identically by construction. `keepRejected`
    * emits every row with its `pred_lang` (the audit shape). */
  def langGate(stream: DataFrame, textCol: String, allowed: Seq[String],
      keepRejected: Boolean = false): DataFrame = {
    val scored = graft.operators.TextStats.withLangScores(
        stream.withColumn("__lt",
          graft.operators.TextStats.norm(col(textCol))), "__lt")
      .drop("__lt")
      .drop(graft.operators.LangProfiles.langs.map(l => s"score_$l"): _*)
    if (keepRejected) scored
    else scored.filter(col("pred_lang").isin(allowed: _*))
  }

  /** Streaming quality gate — the TRAINED classifier
    * ([[graft.operators.TextStats.classifierTrain]]) deployed at the
    * frontier: one codegen logit fold per row against the weight array
    * (trained offline on the labeled batch corpus, rides as a
    * literal), keep rows whose logit clears `minLogit`. Stateless like
    * [[langGate]]; together with [[robotsGate]] and [[urlDedup]] this
    * completes the streaming curation funnel: fetch-compliance ->
    * uniqueness -> language -> model-scored quality, with only the
    * dedup holding state. */
  def qualityGate(stream: DataFrame, textCol: String,
      weights: Array[Long], minLogit: Long = 0L,
      keepRejected: Boolean = false): DataFrame = {
    val scored = stream.withColumn("logit_milli",
      graft.operators.TextStats.classifierLogit(col(textCol), weights))
    if (keepRejected) scored.withColumn("kept", col("logit_milli") > minLogit)
    else scored.filter(col("logit_milli") > minLogit)
  }

  /** Streaming encoding-damage gate — [[graft.operators.TextStats
    * .encodingArtifacts]]'s kernel at the frontier: drop rows whose
    * RAW text carries replacement chars, C1 controls, double-encoded
    * UTF-8 pairs, or stray C0 controls. Stateless, one codegen call
    * per row; in the curation funnel it runs FIRST after ingest —
    * damaged bytes should never reach the language or quality
    * models. */
  def encodingGate(stream: DataFrame, textCol: String,
      keepRejected: Boolean = false): DataFrame = {
    // stage the kernel array through ONE projection before indexing it
    // (the batch operators' discipline): indexing the expression 4×
    // inline relies on codegen subexpression elimination, and in an
    // interpreted fallback path the text would be scanned 4× per row
    val staged = stream.withColumn("__enc_ar",
      graft.functions.encoding.encoding_artifacts(col(textCol)))
    val ar = col("__enc_ar")
    val flagged = staged.withColumn("__enc_ok",
      ar(0) + ar(1) + ar(2) + ar(3) === 0L).drop("__enc_ar")
    if (keepRejected) flagged.withColumnRenamed("__enc_ok", "enc_ok")
    else flagged.filter(col("__enc_ok")).drop("__enc_ok")
  }

  /** Streaming information-density gate —
    * [[graft.operators.TextStats.entropyGauge]]'s kernel at the
    * frontier: drop char-degenerate (milli char entropy <
    * `minCharMilli`) and token-repetitive (token-entropy permille <
    * `minTokenPermille`) rows. Stateless, one codegen call per row;
    * catches the machine-generated repetition the trained classifier
    * was never taught to reject. */
  def entropyGate(stream: DataFrame, textCol: String,
      minCharMilli: Long = 3200L, minTokenPermille: Long = 500L,
      keepRejected: Boolean = false): DataFrame = {
    // same staging discipline as encodingGate: evaluate the kernel
    // once into a column, then index the column
    val staged = stream.withColumn("__ent_st",
      graft.functions.entropy.entropy_stats(
        graft.operators.TextStats.norm(col(textCol))))
    val st = col("__ent_st")
    val flagged = staged.withColumn("__ent_ok",
      st(2) >= minCharMilli && st(6) >= minTokenPermille).drop("__ent_st")
    if (keepRejected) flagged.withColumnRenamed("__ent_ok", "ent_ok")
    else flagged.filter(col("__ent_ok")).drop("__ent_ok")
  }

  /** Streaming WARC ingestion: each incoming blob (one WARC file /
    * fetch batch) is parsed with the strict reader
    * ([[graft.sources.Warc]] — hostile-length guarded, zip-bomb
    * capped) and exploded into records. Stateless flatMap: no
    * watermark, no state store, so a malformed blob fails ITS
    * micro-batch loudly (the ingest retry/quarantine hook) and
    * throughput scales with partitions. Returns (ts, warc_type,
    * target_uri, http_status, content_length, body_utf8) — warc_type
    * is emitted because a real crawl file interleaves warcinfo /
    * request / metadata records with the responses (those rows carry
    * http_status 0 and the raw payload; consumers filter on
    * warc_type = 'response' for the fetched content). */
  final case class WarcRow(ts: Timestamp, warc_type: String,
      target_uri: String, http_status: Long, content_length: Long,
      body: String)

  def warcIngest(stream: DataFrame, bytesCol: String,
      maxInflate: Long = 1L << 30): DataFrame =
    stream.select(col("ts"), col(bytesCol))
      .flatMap { r =>
        val blob = r.getAs[Array[Byte]](1)
        // the strict-contract boundary: a null blob must fail loudly
        // like every other malformed input, not NPE anonymously
        require(blob != null,
          s"WARC ingest: null blob at ts ${r.getTimestamp(0)}")
        graft.sources.Warc.parseAll(blob, maxInflate).map { w =>
          WarcRow(r.getTimestamp(0), w.warcType, w.targetUri,
            w.httpStatus.toLong, w.contentLength,
            new String(w.body, java.nio.charset.StandardCharsets.UTF_8))
        }
      }(org.apache.spark.sql.Encoders.product[WarcRow])
      .toDF()

  final case class WarcMediaRow(ts: Timestamp, target_uri: String,
      content_type: String, body: Array[Byte])

  /** Streaming MEDIA extraction from crawl blobs — the binary
    * counterpart of [[warcIngest]] (whose rows carry text bodies):
    * parse each WARC blob strictly, keep status-200 response records
    * whose HTTP Content-Type starts with `typePrefix`, and emit the
    * RAW payload bytes. Composes with
    * [[imageDedupAgainstIndex]] into the streaming crawl->decode->
    * perceptual-dedup pipeline (the X183 batch composition's
    * streaming twin); stateless flatMap, no state store. */
  def warcMediaIngest(stream: DataFrame, bytesCol: String,
      typePrefix: String = "image/",
      maxInflate: Long = 1L << 30): DataFrame =
    stream.select(col("ts"), col(bytesCol))
      .flatMap { r =>
        val blob = r.getAs[Array[Byte]](1)
        require(blob != null,
          s"WARC media ingest: null blob at ts ${r.getTimestamp(0)}")
        graft.sources.Warc.parseAll(blob, maxInflate).collect {
          case w if w.httpStatus == 200 &&
              w.httpContentType.startsWith(typePrefix) =>
            WarcMediaRow(r.getTimestamp(0), w.targetUri,
              w.httpContentType, w.body)
        }
      }(org.apache.spark.sql.Encoders.product[WarcMediaRow])
      .toDF()

  final case class MediaScrubRow(ts: Timestamp, target_uri: String,
      container: String, had_gps: Boolean, n_stripped_bytes: Long,
      out_len: Long, dhash: String, body: Array[Byte])

  /** Streaming privacy scrub + container normalization — the online
    * form of the mm_warc_privacy_pipeline stages between ingest and
    * dedup: per media row, EXIF detect (total over jpeg/png/gif/bmp),
    * container-appropriate metadata strip (BMP defines none — passes
    * through with delta 0), a re-detect self-check (EXIF surviving
    * the strip fails the row loudly — a scrub that silently leaks GPS
    * is worse than a dead micro-batch), re-encode as canonical
    * stored-PNG, and the inline perceptual hash. Stateless per-row
    * map — no watermark, no state store; emits the NORMALIZED bytes
    * so [[imageDedupAgainstIndex]] composes downstream unchanged. */
  def mediaPrivacyScrub(media: DataFrame): DataFrame =
    media.select(col("ts"), col("target_uri"), col("body"))
      .map { r =>
        val b = r.getAs[Array[Byte]](2)
        val (container, exif) = graft.operators.Exif.fromImage(b)
        val hadGps = exif.exists(_.hasGps)
        val (stripped, _) = container match {
          case "jpeg" => graft.operators.JpegCodec.stripMetadata(b)
          case "png" => graft.operators.Multimodal.PngCodec.stripMetadata(b)
          case "gif" => graft.operators.Multimodal.GifCodec.stripMetadata(b)
          case _ => (b, 0) // bmp: no metadata slots to strip
        }
        if (graft.operators.Exif.fromImage(stripped)._2.nonEmpty)
          throw new IllegalStateException(
            s"EXIF survived the $container strip (${r.getString(1)})")
        val (w, h, px) = graft.operators.Multimodal.decodeImage(stripped)
        val png = graft.operators.Multimodal.PngCodec.encodeRgb(w, h, px)
        val (nw, nh, npx) = graft.operators.Multimodal.PngCodec.decode(png)
        MediaScrubRow(r.getTimestamp(0), r.getString(1), container, hadGps,
          (b.length - stripped.length).toLong, png.length.toLong,
          graft.operators.Multimodal.dHashOf(nw, nh, npx), png)
      }(org.apache.spark.sql.Encoders.product[MediaScrubRow])
      .toDF()

  /** A [[warcIngestQuarantine]] row: either a parsed record
    * (`quarantined = false`, q_* null/-1) or a quarantine marker for a
    * whole malformed blob (`quarantined = true`, record columns
    * null/0, q_offset = byte offset where the strict parser rejected,
    * q_reason = its message). */
  final case class WarcIngestRow(ts: Timestamp, warc_type: String,
      target_uri: String, http_status: Long, content_length: Long,
      body: String, quarantined: Boolean, q_offset: Long,
      q_reason: String)

  /** [[warcIngest]] with a QUARANTINE side-output instead of the
    * fail-the-micro-batch contract — the operational form for a crawl
    * ingest where one hostile file among millions is routine: each
    * blob either parses fully (strict parser, unchanged) or becomes
    * ONE quarantine row carrying (ts, q_offset, q_reason) from the
    * typed [[graft.sources.Warc.WarcParseException]]. Still a
    * stateless flatMap — no watermark, no state store. Split the two
    * row kinds into sinks with [[warcQuarantineSinks]] (exactly-once
    * on both). A null blob quarantines with q_offset = -1. */
  def warcIngestQuarantine(stream: DataFrame, bytesCol: String,
      maxInflate: Long = 1L << 30): DataFrame =
    stream.select(col("ts"), col(bytesCol))
      .flatMap { r =>
        val ts = r.getTimestamp(0)
        val blob = r.getAs[Array[Byte]](1)
        if (blob == null)
          Seq(WarcIngestRow(ts, null, null, 0L, 0L, null,
            quarantined = true, -1L, "WARC ingest: null blob"))
        else graft.sources.Warc.parseAllOr(blob, maxInflate) match {
          case Right(recs) => recs.map { w =>
            WarcIngestRow(ts, w.warcType, w.targetUri,
              w.httpStatus.toLong, w.contentLength,
              new String(w.body, java.nio.charset.StandardCharsets.UTF_8),
              quarantined = false, -1L, null)
          }
          case Left(q) =>
            Seq(WarcIngestRow(ts, null, null, 0L, 0L, null,
              quarantined = true, q.offset, q.reason))
        }
      }(org.apache.spark.sql.Encoders.product[WarcIngestRow])
      .toDF()

  /** foreachBatch splitter for [[warcIngestQuarantine]]: good records
    * land under `goodPath`, quarantine rows (ts, q_offset, q_reason)
    * under `quarantinePath` — BOTH through the per-batch
    * dynamic-partition overwrite of [[idempotentBatchWriter]], so a
    * replayed micro-batch overwrites its own partition in each sink:
    * exactly-once on both outputs. The micro-batch is persisted for
    * the two passes so blobs are not re-parsed per sink. */
  def warcQuarantineSinks(goodPath: String,
      quarantinePath: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val b = batch.persist()
      try {
        writeBatchPartition(
          b.filter(!col("quarantined"))
            .drop("quarantined", "q_offset", "q_reason"),
          goodPath, batchId)
        writeBatchPartition(
          b.filter(col("quarantined"))
            .select(col("ts"), col("q_offset"), col("q_reason")),
          quarantinePath, batchId)
      } finally { b.unpersist(); () }
    }

  /** Online near-duplicate check of an incoming document stream against
    * a static corpus: simhash both sides, join on the 4 16-bit chunk
    * keys (a stateless stream-static equi-join — no watermark, no state
    * store, so state never grows however long the stream runs), verify
    * Hamming distance exactly, and dedup multi-chunk hits with the
    * row-local first-agreeing-chunk predicate — a streaming query could
    * not `distinct()` that without unbounded state. Returns
    * (in_id, corpus_id, hamming) matches; the corpus side is re-read
    * per micro-batch unless the caller persists it. */
  def nearDupAgainstCorpus(stream: DataFrame, corpus: DataFrame,
      idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val in = graft.operators.Dedup.simhashChunked(stream, idCol, textCol)
      .select(col("chunk"), col("ckey"), col(idCol).as("in_id"), col("fp").as("fp_a"))
    val idx = graft.operators.Dedup.simhashChunked(corpus, idCol, textCol)
      .select(col("chunk"), col("ckey"), col(idCol).as("corpus_id"), col("fp").as("fp_b"))
    in.join(idx, Seq("chunk", "ckey"))
      .filter(graft.operators.Dedup.firstAgreeingChunk)
      .select(col("in_id"), col("corpus_id"),
        expr("bit_count(fp_a ^ fp_b)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Streaming referential-integrity monitor — the online form of
    * [[graft.operators.TableProfile.integrityCheck]]: events whose
    * foreign key has no row in the static dimension surface as
    * windowed orphan counts (a stream-static LEFT OUTER equi-join is
    * stateless — no watermark-vs-static semantics issue, no state
    * store — followed by a watermarked tumbling count, the
    * append-ready aggregation). The standard "alert when a producer
    * starts emitting unknown keys" pipeline guard; null keys count
    * into `n_null_keys` (they can never match a FK, same visibility
    * the batch op's integrityCheck gives), not into orphans. */
  def fkOrphanCounts(stream: DataFrame, keyCol: String,
      dim: DataFrame, dimKeyCol: String, width: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    // the watermark is assigned on the RAW stream, before any filter or
    // join: every event must advance event time — null-key events
    // included — otherwise a null-heavy (or orphan-free) producer
    // never closes a window
    val keys = stream.select(col("ts"), col(keyCol).as("__k"))
      .withWatermark("ts", watermark)
    val parents = dim.select(col(dimKeyCol).as("__k")).distinct()
      .withColumn("__hit", lit(1))
    // left outer (not anti): null keys survive with __hit null, and the
    // orphan/null split happens in the aggregate — one stateless join,
    // one windowed agg, both conditions decided per-row
    val isOrphan = col("__k").isNotNull && col("__hit").isNull
    keys.join(parents, Seq("__k"), "left")
      .groupBy(window(col("ts"), width))
      .agg(count(when(isOrphan, lit(1))).as("n_orphans"),
        count(when(col("__k").isNull, lit(1))).as("n_null_keys"),
        approx_count_distinct(when(isOrphan, col("__k"))).as("approx_keys"))
      .select(col("window.start").as("w_start"), col("n_orphans"),
        col("n_null_keys"), col("approx_keys"))
  }

  /** Streaming per-domain token accounting — the online form of
    * [[graft.operators.CorpusMix.domainMix]]: windowed (domain,
    * n_docs, sum_tokens) over a document stream keyed by registrable
    * domain. The extraction is the same pure codegen'd expression as
    * the batch op, so batch backfill and stream agree row-for-row;
    * watermarked tumbling windows make the aggregate append-ready.
    * The ingestion-side view of "which domains are flooding the
    * corpus right now" that a crawl pipeline rate-limits on. */
  def domainTokenCounts(stream: DataFrame, urlCol: String,
      textCol: String, width: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame = {
    val toks = graft.operators.CorpusMix.wsTokenCount(col(textCol))
    stream.select(col("ts"),
        graft.operators.CorpusMix.registrableDomain(col(urlCol)).as("domain"),
        toks.as("__t"))
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width), col("domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__t")).as("sum_tokens"))
      .select(col("window.start").as("w_start"), col("domain"),
        col("n_docs"), col("sum_tokens"))
  }

  /** Online Kneser–Ney LM quality scoring of a document stream
    * against a reference model trained BATCH-side
    * ([[graft.operators.TextStats.knTrain]] -> `knTable`) — the CCNet
    * deployment shape: the bounded model rides the closure as a
    * broadcast lookup table and each micro-batch scores row-locally
    * (one codegen kernel call per doc), so the query is STATELESS —
    * append-mode safe, no state store, no stream-static join to
    * re-plan per batch. Scores are bit-identical to the batch
    * operator's join path (spec-pinned). */
  def knScore(stream: DataFrame, idCol: String, textCol: String,
      table: graft.functions.KnLmTable): DataFrame =
    graft.operators.TextStats.knScoreWithTable(stream, idCol, textCol,
      table)

  /** Stream-stream interval join: each left event matches right events
    * of the same key whose timestamp falls in [left.ts, left.ts +
    * horizon] — e.g. purchases attributed to the click they followed.
    * Both sides carry watermarks and the join condition bounds
    * event-time distance, so the state store retains each side only for
    * watermark + horizon — the configuration under which Spark can
    * provably evict state, letting the join run unbounded. */
  /** `joinType` "inner" emits matches as found; "left_outer"
    * additionally emits a null-padded row for each unmatched left event
    * once the watermark proves no match can still arrive (l_ts +
    * horizon behind the watermark) — the attribution-with-
    * abandonment-tracking shape. */
  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String,
      horizon: String = "1 hour", watermark: String = "10 minutes",
      joinType: String = "inner"): DataFrame = {
    val l = left.select(col(keyCol).as("__lk"), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(keyCol).as("__rk"), col("ts").as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r, col("__lk") === col("__rk") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $horizon"),
        joinType)
      .select(col("__lk").as(keyCol), col("l_ts"), col("r_ts"))
  }

  /** Streaming point-cloud ingest monitor: watermarked tumbling
    * per-grid-cell point counts + z extremes over a stream of
    * (ts, x, y, z) points — the live-ingest shape of the batch
    * [[graft.operators.BlockedCloud.gridAggregate]] raster. State is
    * bounded by (cells touched per window) x (windows within the
    * watermark), independent of stream length. */
  def gridCellCounts(points: DataFrame, cell: Double,
      width: String = "1 hour", watermark: String = "10 minutes"): DataFrame =
    points.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), width),
        floor(col("x") / cell).cast("long").as("cell_x"),
        floor(col("y") / cell).cast("long").as("cell_y"))
      .agg(count(lit(1)).as("n_points"),
        min(col("z")).as("min_z"), max(col("z")).as("max_z"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("cell_x"), col("cell_y"), col("n_points"), col("min_z"), col("max_z"))

  /** Streaming count-min grid: per tumbling window, the d x w counter
    * grid of [[graft.operators.Events.heavyHittersCms]] as a
    * watermarked streaming aggregation. This is WHY sketches exist in
    * streams: a per-key streaming count holds O(distinct keys) state,
    * while this holds O(depth * w) cells per open window no matter how
    * many keys flow through — and the closed grid still answers "which
    * keys are heavy" with no false negatives when probed batch-side
    * (same deterministic lehmer3 bucket streams as the batch op, so
    * grid cells are bit-identical to a batch build over the same
    * window's rows). */
  def cmsGrid(events: DataFrame, keyCol: String, width: String = "1 hour",
      watermark: String = "10 minutes", depth: Int = 4,
      w: Int = 512, stateParts: Int = 0): DataFrame = {
    import graft.functions.hashes.lehmer3
    pinStateParts(events, stateParts)
    val key = col(keyCol).cast("long")
    events.withWatermark("ts", watermark)
      .select(col("ts"), explode(array((0 until depth).map(i =>
        struct(lit(i).as("i"),
          pmod(lehmer3(key + lit(i * 1000003L)), lit(w.toLong)).as("b"))): _*))
        .as("ib"))
      .groupBy(window(col("ts"), width), col("ib.i"), col("ib.b"))
      .agg(count(lit(1)).as("c"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("i"), col("b"), col("c"))
  }

  /** Exactly-once parquet sink for foreachBatch: each micro-batch lands
    * in its own `__batch=<id>` partition with dynamic partition
    * overwrite, so a replayed batch (restart after a sink failure)
    * OVERWRITES its own partition instead of appending duplicates —
    * at-least-once delivery + idempotent write = exactly-once output.
    * Usage: `stream.writeStream.foreachBatch(idempotentBatchWriter(path)).start()`. */
  def idempotentBatchWriter(path: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      writeBatchPartition(batch, path, batchId)

  private def writeBatchPartition(batch: DataFrame, path: String,
      batchId: Long): Unit =
    batch.withColumn("__batch", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch")
      .parquet(path)

  /** Streaming near-duplicate check of a document stream against a
    * PERSISTED minhash index (built once by
    * [[graft.operators.Dedup.writeNearDupIndex]]): each micro-batch
    * runs the banded delta-vs-corpus pass — the corpus is never
    * re-shingled, band keys come from the stored signatures — and the
    * verified (in_id, corpus_id, jaccard) matches land through the
    * exactly-once batch sink, so a replayed micro-batch overwrites its
    * own output partition instead of duplicating pairs. Combine with a
    * periodic batch re-index to absorb accepted documents into the
    * corpus. Usage:
    * `docs.writeStream.foreachBatch(nearDupAgainstIndex(spark, idx, out, "doc_id", "text")).start()`. */
  def nearDupAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, outPath: String, idCol: String, textCol: String,
      threshold: Double = 0.5): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val pairs = graft.operators.Dedup.nearDupsAgainstIndex(
        spark, indexDir, batch, idCol, textCol, threshold = threshold)
      pairs.withColumn("__batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch")
        .parquet(outPath)
    }

  /** Streaming image-ingest dedup against the persisted perceptual
    * index (the multimodal parity of [[nearDupAgainstIndex]]): each
    * micro-batch of (media_id, kind, bytes) rows decodes, dHashes, and
    * band-joins against [[graft.operators.Multimodal.writeDHashIndex]]'s
    * store — the corpus is never re-decoded — and the matched pairs
    * land through the exactly-once `__batch` partition overwrite, so a
    * replayed micro-batch overwrites its own pairs. Combine with a
    * periodic batch re-index to absorb accepted images. Usage:
    * `imgs.writeStream.foreachBatch(imageDedupAgainstIndex(spark, idx, out)).start()`. */
  def imageDedupAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, outPath: String,
      maxHamming: Int = 8): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val pairs = graft.operators.Multimodal.imageNearDupsAgainstIndex(
        spark, indexDir, batch, maxHamming)
      pairs.withColumn("__batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch")
        .parquet(outPath)
    }

  /** Streaming video-ingest dedup against the persisted signature
    * index — the video cell of the streaming dedup matrix: each
    * micro-batch of (media_id, kind, bytes) clips decodes, segments,
    * and hashes its scene reps, band-joins against
    * [[graft.operators.Multimodal.writeVideoSignatureIndex]]'s store
    * (the corpus is never re-decoded; the small delta side
    * broadcasts), and lands (in_id, corpus_id, n_shared_scenes) pairs
    * under the exactly-once `__batch` overwrite so a replayed
    * micro-batch never duplicates. A trimmed or re-encoded copy of an
    * indexed clip pairs at ingest time — before it costs storage or a
    * training epoch. Usage: `clips.writeStream
    * .foreachBatch(videoDedupAgainstIndex(spark, idx, out)).start()`. */
  def videoDedupAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, outPath: String, maxHamming: Int = 3,
      minSharedScenes: Long = 2L): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val pairs = graft.operators.Multimodal.videoNearDupsAgainstIndex(
        spark, indexDir, batch, maxHamming = maxHamming,
        minSharedScenes = minSharedScenes)
      pairs.withColumn("__batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch")
        .parquet(outPath)
    }

  /** Streaming audio-ingest dedup against the persisted fingerprint
    * index — completes the streaming dedup matrix (text: near-dup
    * index; image: dHash index; audio: this): each micro-batch of
    * (media_id, kind, bytes) recordings fingerprints through the real
    * decoders and equi-joins the store's energy-contour fps (exact
    * cross-container dedup — a FLAC arrival matches its WAV-indexed
    * twin), landing (in_id, corpus_id) pairs under the exactly-once
    * `__batch` overwrite so a replayed micro-batch never duplicates.
    * The corpus is never re-decoded. Usage:
    * `stream.writeStream.foreachBatch(audioDedupAgainstIndex(spark, dir, out)).start()` */
  def audioDedupAgainstIndex(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, outPath: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) => {
      val pairs = graft.operators.Multimodal.audioDupsAgainstIndex(
        spark, indexDir, batch)
      pairs.withColumn("__batch", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch")
        .parquet(outPath)
    }

  /** Streaming ingest into a STORED 3D cloud (the 3D parity of the
    * grid-ingest path): each micro-batch of (x, y, z) points packs
    * under the stored key split and lands through
    * [[graft.operators.PointCloud3.appendBatch]]'s exactly-once delta
    * partitions — a replayed micro-batch overwrites its own partition
    * and count-ledger row instead of appending twice. Usage:
    * `points.writeStream.foreachBatch(cloud3Ingest(spark, dir)).start()`;
    * run [[graft.operators.PointCloud3]] queries against `read(dir)`
    * at any time. */
  def cloud3Ingest(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      graft.operators.PointCloud3.appendBatch(spark, dir, batch, batchId)

  /** Streaming ingest into a stored 2D cloud — same exactly-once
    * delta-partition + ledger mechanics via
    * [[graft.operators.PointCloud.appendBatch]]. */
  def cloudIngest(spark: org.apache.spark.sql.SparkSession,
      dir: String): (DataFrame, Long) => Unit =
    (batch: DataFrame, batchId: Long) =>
      graft.operators.PointCloud.appendBatch(spark, dir, batch, batchId)

  /** Custom-state shape: running per-user totals via
    * flatMapGroupsWithState — the template for any bespoke online
    * aggregate (rate limiting, anomaly flags, decayed counters). */
  def runningTotals(events: Dataset[Ev]): Dataset[UserRunning] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[UserRunning, UserRunning](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[Ev], state: GroupState[UserRunning]) =>
          val prev = state.getOption.getOrElse(UserRunning(user, 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[UserRunning]
          var cur = prev
          rows.foreach { e =>
            cur = UserRunning(user, cur.n_events + 1,
              cur.value_milli + math.round(e.value * 1000))
            out += cur
          }
          state.update(cur)
          out.iterator
      }
  }
}
