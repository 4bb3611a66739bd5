package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def media: DataFrame = Multimodal.asMediaTable(
    Seq((0L, "abcdefgh" * 20), (1L, "short"), (2L, "x" * 100))
      .toDF("doc_id", "text"),
    "doc_id", "text",
    when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio").otherwise("video"))

  test("media table schema contract") {
    assert(media.schema == Multimodal.mediaSchema)
  }

  test("decodeMeta derives deterministic dims and rates") {
    val m = Multimodal.decodeMeta(media).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(0L).getString(1) == "image" && m(0L).getLong(2) == 160)
    assert(m(0L).getInt(3) == 64 + 160 % 512)
    assert(m(0L).getInt(4) == 64 + (160 * 31) % 512)
    assert(m(1L).getInt(6) == 16000) // audio
    assert(m(2L).getInt(6) == 30)    // video
  }

  test("extractFeatures: fixed dim, padded, checksum folds bytes") {
    val f = Multimodal.extractFeatures(media, dim = 16).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(f(1L).getSeq[Float](3).length == 16)
    // "short": ceil(5/7)=1 sample then zero padding
    assert(f(1L).getSeq[Float](3)(0) == 's'.toFloat)
    assert(f(1L).getSeq[Float](3)(1) == 0f)
    val expectCk = "short".getBytes.foldLeft(0L)((h, b) => (h * 31 + (b & 0xff)) % 1000000007L)
    assert(f(1L).getLong(2) == expectCk)
  }

  test("sampleFrames explodes only video rows, every k-th frame") {
    val frames = Multimodal.sampleFrames(media, everyK = 2, frameBytes = 32)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).length))
    assert(frames.forall(_._1 == 2L)) // only the video row
    // 100 bytes / 32 = 3 frames, every 2nd -> idx 0 and 2
    assert(frames.map(_._2).sorted.toSeq == Seq(0, 2))
    assert(frames.find(_._2 == 2).get._3 == 32)
  }

  test("resize re-strides to the target cell budget") {
    val r = Multimodal.resize(media, targetCells = 8).collect()
      .map(x => x.getLong(0) -> x.getAs[Array[Byte]](1)).toMap
    assert(r(0L).length == 8)  // 160 bytes -> 8 cells, stride 20
    assert(r(1L).length == 5)  // shorter than target -> identity
    assert(new String(r(1L)) == "short")
  }

  test("ImageHeader parses real PNG containers (and the PNG is valid)") {
    val png = Multimodal.ImageHeader.encodePngStored(37, 23,
      (x, y) => (x * 7 + y * 13) % 251)
    assert(Multimodal.ImageHeader.dims(png).contains((37, 23)))
    // length is exactly predictable: 68 + h*(w+1)
    assert(png.length == 68 + 23 * 38)
    // cross-check with an INDEPENDENT reader: the JDK's PNG decoder
    // must open it and agree on dimensions and a pixel value
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    assert(img.getWidth == 37 && img.getHeight == 23)
    // raw raster sample (getRGB would gamma-map linear gray to sRGB)
    assert(img.getRaster.getSample(5, 4, 0) == (5 * 7 + 4 * 13) % 251)
  }

  test("ImageHeader parses real JPEG containers from the JDK encoder") {
    val jpg = Multimodal.ImageHeader.encodeJpeg(41, 17, (x, y) => (x + y) % 200)
    assert(Multimodal.ImageHeader.dims(jpg).contains((41, 17)))
  }

  test("ImageHeader returns None for non-image payloads") {
    assert(Multimodal.ImageHeader.dims("just some text bytes".getBytes).isEmpty)
    assert(Multimodal.ImageHeader.dims(Array[Byte]()).isEmpty)
    assert(Multimodal.ImageHeader.dims(Array(0xff.toByte, 0xd8.toByte)).isEmpty)
    // a truncated PNG signature is not a PNG
    assert(Multimodal.ImageHeader.dims(
      Array(0x89.toByte, 'P'.toByte, 'N'.toByte)).isEmpty)
  }

  test("decodeMeta uses real header dims for image containers") {
    val png = Multimodal.ImageHeader.encodePngStored(12, 9, (_, _) => 1)
    val df = Seq((7L, "image", png)).toDF("media_id", "kind", "bytes")
    val row = Multimodal.decodeMeta(df).collect().head
    assert(row.getInt(3) == 12 && row.getInt(4) == 9)
    assert(row.getLong(2) == png.length.toLong)
  }

  test("WavCodec: encode -> parse -> samples roundtrip") {
    val pcm = Array.tabulate(1000)(k => ((k * 37) % 4096) - 2048)
    val wav = Multimodal.WavCodec.encodePcm16(16000, pcm)
    val info = Multimodal.WavCodec.parse(wav).get
    assert(info.sampleRate == 16000 && info.channels == 1 && info.bitsPerSample == 16)
    assert(info.nSamples == 1000)
    assert(Multimodal.WavCodec.samples(wav, info).toSeq == pcm.toSeq)
  }

  test("WavCodec: skips unknown chunks (odd sizes padded) to reach data") {
    val pcm = Array(100, -100, 32767, -32768)
    val base = Multimodal.WavCodec.encodePcm16(8000, pcm)
    // splice a 5-byte LIST chunk (odd -> 1 pad byte) between fmt and data
    val insertAt = 36 // end of fmt chunk
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](5, 0, 0, 0, 1, 2, 3, 4, 5, 0)
    val spliced = base.take(insertAt) ++ extra ++ base.drop(insertAt)
    // patch the RIFF size field
    val bb = java.nio.ByteBuffer.wrap(spliced).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(4, spliced.length - 8)
    val info = Multimodal.WavCodec.parse(spliced).get
    assert(info.sampleRate == 8000 && info.nSamples == 4)
    assert(Multimodal.WavCodec.samples(spliced, info).toSeq == pcm.toSeq)
  }

  test("WavCodec: rejects non-PCM, truncated, and non-WAV payloads") {
    val pcm = Array(1, 2, 3)
    val wav = Multimodal.WavCodec.encodePcm16(8000, pcm)
    assert(Multimodal.WavCodec.parse("not audio".getBytes).isEmpty)
    assert(Multimodal.WavCodec.parse(wav.take(30)).isEmpty)
    val nonPcm = wav.clone
    nonPcm(20) = 3 // audio format IEEE float
    assert(Multimodal.WavCodec.parse(nonPcm).isEmpty)
  }

  test("wavSegmentStats windows real PCM and skips undecodable audio") {
    import spark.implicits._
    val pcm = Array.tabulate(500)(k => (k % 100) - 50)
    val wav = Multimodal.WavCodec.encodePcm16(16000, pcm)
    val df = Seq(
      (1L, "audio", wav),
      (2L, "audio", "mp3-pretend-bytes".getBytes),
      (3L, "video", wav)).toDF("media_id", "kind", "bytes")
    val segs = Multimodal.wavSegmentStats(df, windowSamples = 200, hopSamples = 150)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(segs.forall(_._1 == 1L), "undecodable/non-audio rows must be skipped")
    // offsets 0,150,300,450 -> lengths 200,200,200,50
    assert(segs.map(s => (s._2, s._3)).toSeq ==
      Seq((0L, 200L), (1L, 200L), (2L, 200L), (3L, 50L)))
    val w0 = pcm.take(200)
    assert(segs(0)._4 == w0.map(s => s.toLong * s).sum)
    assert(segs(0)._5 == w0.map(math.abs).max.toLong)
  }

  test("Mp4Codec roundtrips movie and track facts through a real box tree") {
    import Multimodal.Mp4Codec
    val tracks = Seq(
      Mp4Codec.TrackInfo(1L, "vide", 600L, 7200L, 640, 480),
      Mp4Codec.TrackInfo(2L, "soun", 16000L, 192000L, 0, 0))
    val bytes = Mp4Codec.encode(600L, 7200L, tracks, Array[Byte](1, 2, 3))
    val m = Mp4Codec.parse(bytes).get
    assert(m.timescale == 600L && m.duration == 7200L)
    assert(m.tracks.map(t => (t.trackId, t.handler, t.timescale, t.duration,
      t.width, t.height)) == tracks.map(t => (t.trackId, t.handler,
      t.timescale, t.duration, t.width, t.height)))
  }

  test("Mp4Codec parses version-1 (64-bit) headers and largesize boxes") {
    import java.nio.ByteBuffer
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = ByteBuffer.allocate(8 + payload.length)
      out.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      out.array()
    }
    // mvhd v1: 8-byte creation/modification/duration
    val mvhd1 = {
      val o = ByteBuffer.allocate(112)
      o.putInt(0x01000000) // version 1
      o.putLong(0L).putLong(0L).putInt(90000).putLong(123456789L)
      o.array()
    }
    // a moov wrapped in a LARGESIZE header (size == 1 + 64-bit size)
    val inner = box("mvhd", mvhd1)
    val moov = {
      val o = ByteBuffer.allocate(16 + inner.length)
      o.putInt(1).put("moov".getBytes("US-ASCII"))
        .putLong(16L + inner.length).put(inner)
      o.array()
    }
    val ftyp = box("ftyp", "isom   ".getBytes("US-ASCII"))
    val m = Multimodal.Mp4Codec.parse(ftyp ++ moov).get
    assert(m.timescale == 90000L && m.duration == 123456789L)
    assert(m.tracks.isEmpty)
  }

  test("Mp4Codec rejects hostile or non-BMFF payloads") {
    import Multimodal.Mp4Codec
    assert(Mp4Codec.parse("not an mp4 at all".getBytes).isEmpty)
    val good = Mp4Codec.encode(600L, 600L,
      Seq(Mp4Codec.TrackInfo(1L, "vide", 600L, 600L, 320, 240)), Array[Byte]())
    assert(Mp4Codec.parse(good).isDefined)
    // corrupt the moov size to claim more bytes than exist
    val evil = good.clone
    val moovOff = good.indexOfSlice("moov".getBytes) - 4
    evil(moovOff) = 0x7f // size high byte -> ~2 GB
    assert(Mp4Codec.parse(evil).isEmpty)
    // truncated mid-box
    assert(Mp4Codec.parse(good.take(good.length - 5)).isEmpty)
  }

  test("Mp4Codec survives fuzzed and bit-flipped inputs without throwing") {
    import Multimodal.Mp4Codec
    val rnd = new scala.util.Random(47)
    // pure garbage of assorted sizes: must return None or Some, never throw
    (0 until 300).foreach { _ =>
      val b = new Array[Byte](rnd.nextInt(200))
      rnd.nextBytes(b)
      Mp4Codec.parse(b) // no exception is the assertion
    }
    // mutated valid files: flip one byte anywhere (sizes, types, counts)
    val good = Mp4Codec.encode(600L, 1800L,
      Seq(Mp4Codec.TrackInfo(1L, "vide", 600L, 1800L, 640, 480),
        Mp4Codec.TrackInfo(2L, "soun", 16000L, 48000L, 0, 0)),
      Array.tabulate(16)(_.toByte))
    (0 until 400).foreach { _ =>
      val evil = good.clone
      evil(rnd.nextInt(evil.length)) = rnd.nextInt(256).toByte
      Mp4Codec.parse(evil) // no exception is the assertion
    }
    // truncations at every prefix length of the valid file
    (0 until good.length).foreach(n => Mp4Codec.parse(good.take(n)))
    // a CONSISTENT box tree whose tkhd payload (4 bytes) is shorter
    // than the fixed field layout — sizes all check out in the walk,
    // so only the per-box minimum-size guards stop the field reads
    // from running past the end of the array
    def bx(typ: String, payload: Array[Byte]): Array[Byte] = {
      val o = java.nio.ByteBuffer.allocate(8 + payload.length)
      o.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      o.array()
    }
    val stubbyTrak = bx("trak", bx("tkhd", Array[Byte](0, 0, 0, 0)))
    val stubby = bx("ftyp", "isom".getBytes) ++ bx("moov", stubbyTrak)
    val parsed = Mp4Codec.parse(stubby)
    // no movie header -> None; the point is it must not throw
    assert(parsed.isEmpty)
  }

  test("mp4Meta extracts container facts, skips non-MP4 payloads") {
    import spark.implicits._
    import Multimodal.Mp4Codec
    val a = Mp4Codec.encode(600L, 1800L,
      Seq(Mp4Codec.TrackInfo(1L, "vide", 600L, 1800L, 1280, 720),
        Mp4Codec.TrackInfo(2L, "soun", 44100L, 132300L, 0, 0)),
      Array[Byte](9))
    val b = Mp4Codec.encode(1000L, 2500L,
      Seq(Mp4Codec.TrackInfo(1L, "vide", 1000L, 2500L, 320, 240)),
      Array[Byte]())
    val df = Seq((1L, a), (2L, b), (3L, "junk".getBytes))
      .toDF("media_id", "bytes")
    val got = Multimodal.mp4Meta(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
        r.getInt(4), r.getInt(5), r.getBoolean(6))).sortBy(_._1)
    assert(got.toSeq == Seq(
      (1L, 600L, 3000L, 2, 1280, 720, true),
      (2L, 1000L, 2500L, 1, 320, 240, false)))
  }

  test("ImageHeader parses real GIF containers (JDK decoder agrees on pixels)") {
    val gif = Multimodal.ImageHeader.encodeGif(37, 23,
      (x, y) => (x * 7 + y * 13) % 251)
    assert(Multimodal.ImageHeader.dims(gif).contains((37, 23)))
    // cross-check with an INDEPENDENT reader: the JDK GIF decoder must
    // open the uncompressed-LZW stream and agree on dims and pixels
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(gif))
    assert(img.getWidth == 37 && img.getHeight == 23)
    for (x <- Seq(0, 5, 36); y <- Seq(0, 4, 22))
      assert((img.getRGB(x, y) & 0xff) == (x * 7 + y * 13) % 251,
        s"pixel ($x,$y)")
    // a frame spanning several CLEAR resets (> 250 pixels per row)
    val wide = Multimodal.ImageHeader.encodeGif(300, 3, (x, y) => (x + y) % 256)
    val img2 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(wide))
    assert(img2.getWidth == 300 && img2.getHeight == 3)
    for (x <- Seq(0, 249, 250, 251, 299); y <- 0 until 3)
      assert((img2.getRGB(x, y) & 0xff) == (x + y) % 256, s"pixel ($x,$y)")
  }

  test("ImageHeader parses real BMP containers (JDK decoder agrees on pixels)") {
    val bmp = Multimodal.ImageHeader.encodeBmp(37, 23,
      (x, y) => (x * 7 + y * 13) % 251)
    assert(Multimodal.ImageHeader.dims(bmp).contains((37, 23)))
    assert(bmp.length == 54 + 23 * ((37 * 3 + 3) & ~3))
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bmp))
    assert(img.getWidth == 37 && img.getHeight == 23)
    for (x <- Seq(0, 5, 36); y <- Seq(0, 4, 22))
      assert((img.getRGB(x, y) & 0xff) == (x * 7 + y * 13) % 251,
        s"pixel ($x,$y)")
    // top-down (negative height) BMPs parse with absolute height
    val neg = bmp.clone()
    val hNeg = -23
    neg(22) = hNeg.toByte; neg(23) = (hNeg >> 8).toByte
    neg(24) = (hNeg >> 16).toByte; neg(25) = (hNeg >> 24).toByte
    assert(Multimodal.ImageHeader.dims(neg).contains((37, 23)))
    // hostile 'BM'-prefixed payloads: non-positive width or zero
    // height must be rejected, not passed through as dimensions
    val badW = bmp.clone()
    val wNeg = -37
    badW(18) = wNeg.toByte; badW(19) = (wNeg >> 8).toByte
    badW(20) = (wNeg >> 16).toByte; badW(21) = (wNeg >> 24).toByte
    assert(Multimodal.ImageHeader.dims(badW).isEmpty)
    val zeroW = bmp.clone()
    zeroW(18) = 0; zeroW(19) = 0; zeroW(20) = 0; zeroW(21) = 0
    assert(Multimodal.ImageHeader.dims(zeroW).isEmpty)
    val zeroH = bmp.clone()
    zeroH(22) = 0; zeroH(23) = 0; zeroH(24) = 0; zeroH(25) = 0
    assert(Multimodal.ImageHeader.dims(zeroH).isEmpty)
  }

  test("MP4 sample tables: ranges, chunking, dts, keyframes round-trip") {
    val sizes = Array(25, 30, 21, 47, 20, 33, 28) // 7 samples, chunks of 3 -> 3+3+1
    val samples = sizes.zipWithIndex.map { case (sz, i) =>
      Array.tabulate(sz)(k => ((i * 31 + k) % 251).toByte)
    }
    val bytes = Multimodal.Mp4Codec.encodeWithSamples(600L,
      Multimodal.Mp4Codec.TrackInfo(1L, "vide", 600L, 7 * 100L, 320, 240),
      samples, samplesPerChunk = 3, delta = 100L, syncEvery = 4)
    val (mdatStart, tables) = Multimodal.Mp4Codec.parseSampleTables(bytes).get
    assert(tables.size == 1 && tables.head.trackId == 1L)
    assert(tables.head.chunkOffsets.length == 3, "3+3+1 chunking")
    val got = Multimodal.Mp4Codec.sampleRanges(tables.head)
    var off = 0L
    for (i <- sizes.indices) {
      val (idx, absOff, sz, dts, key) = got(i)
      assert(idx == i && sz == sizes(i).toLong)
      assert(absOff - mdatStart == off, s"sample $i offset")
      assert(dts == i * 100L)
      assert(key == (i % 4 == 0), s"sample $i keyframe")
      off += sizes(i)
    }
    // the ranges address the REAL payload bytes: slice and compare
    for (i <- sizes.indices) {
      val (_, absOff, sz, _, _) = got(i)
      val slice = java.util.Arrays.copyOfRange(bytes, absOff.toInt,
        (absOff + sz).toInt)
      assert(java.util.Arrays.equals(slice, samples(i)), s"sample $i bytes")
    }
    // the metadata parse still reads the same file
    val meta = Multimodal.Mp4Codec.parse(bytes).get
    assert(meta.tracks.head.handler == "vide" && meta.tracks.head.width == 320)
    // files without sample tables (the metadata-only encoder) -> None
    val plain = Multimodal.Mp4Codec.encode(600L, 700L,
      Seq(Multimodal.Mp4Codec.TrackInfo(1L, "vide", 600L, 700L, 320, 240)),
      Array.tabulate(8)(_.toByte))
    assert(Multimodal.Mp4Codec.parseSampleTables(plain).isEmpty)
    // hostile: a size field past the box end must not parse
    val evil = bytes.clone()
    val stszAt = {
      var i = 0
      while (!(evil(i + 4) == 's' && evil(i + 5) == 't' && evil(i + 6) == 's' && evil(i + 7) == 'z')) i += 1
      i
    }
    evil(stszAt + 16) = 0x7f // sample count high byte -> overruns stsz
    assert(Multimodal.Mp4Codec.parseSampleTables(evil).isEmpty)
  }

  test("mp4KeyframePayloads extracts exactly the stss slices with brute-force checksums") {
    import spark.implicits._
    val sizes = Array(25, 30, 21, 47, 20, 33, 28)
    val samples = sizes.zipWithIndex.map { case (sz, i) =>
      Array.tabulate(sz)(k => ((i * 31 + k) % 251).toByte)
    }
    val bytes = Multimodal.Mp4Codec.encodeWithSamples(600L,
      Multimodal.Mp4Codec.TrackInfo(1L, "vide", 600L, 7 * 100L, 320, 240),
      samples, samplesPerChunk = 3, delta = 100L, syncEvery = 4)
    val rows = Multimodal.mp4KeyframePayloads(
        Seq((9L, bytes)).toDF("media_id", "bytes"))
      .collect().map(r => (r.getAs[Long]("sample_idx"),
        r.getAs[Long]("size"), r.getAs[Long]("first_byte"),
        r.getAs[Long]("checksum"))).sortBy(_._1)
    // keyframes are samples 0 and 4 (syncEvery = 4)
    assert(rows.map(_._1).toSeq == Seq(0L, 4L))
    for ((idx, sz, fb, ck) <- rows) {
      val s = samples(idx.toInt)
      assert(sz == s.length.toLong)
      assert(fb == (s(0) & 0xff).toLong)
      val brute = s.zipWithIndex.map { case (b, k) => (k + 1).toLong * (b & 0xff) }.sum
      assert(ck == brute, s"keyframe $idx checksum")
    }
  }

  test("imageAltPairs: tag extraction, missing attrs, canonical join") {
    import spark.implicits._
    val pages = Seq(
      (1L, """<p>x</p><img src="https://E.org/a.png?utm_source=z" alt="cat">""" +
        """<img src="https://e.org/b.png"><img alt="no src">""" +
        """<img src="https://e.org/c.png" alt="dog">"""),
      (2L, """no images here""")).toDF("page_id", "html")
    val images = Seq(
      (10L, "https://e.org/a.png", 8, 4),
      (11L, "https://e.org/c.png", 6, 6),
      (12L, "https://e.org/unreferenced.png", 2, 2))
      .toDF("media_id", "url", "width", "height")
    val got = Multimodal.imageAltPairs(pages, "page_id", "html", images, "url")
      .select("page_id", "media_id", "alt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // tags missing src or alt drop; host case + tracking params fold
    assert(got == Set((1L, 10L, "cat"), (1L, 11L, "dog")), s"got $got")
  }

  test("imageAltPairs: data-src never shadows src; quote styles") {
    import spark.implicits._
    val pages = Seq(
      // lazy-load markup: data-src FIRST must not win over the real src
      (1L, """<img data-src="https://e.org/lazy.png" src="https://e.org/a.png" alt="cat">"""),
      // single-quoted and unquoted attribute values
      (2L, """<img src='https://e.org/b.png' alt='dog'>"""),
      (3L, """<img src=https://e.org/c.png alt="fox">"""),
      // ONLY data-src (no real src) -> tag drops, no mis-join
      (4L, """<img data-src="https://e.org/a.png" alt="ghost">"""))
      .toDF("page_id", "html")
    val images = Seq(
      (10L, "https://e.org/a.png"), (11L, "https://e.org/b.png"),
      (12L, "https://e.org/c.png"), (13L, "https://e.org/lazy.png"))
      .toDF("media_id", "url")
    val got = Multimodal.imageAltPairs(pages, "page_id", "html", images, "url")
      .select("page_id", "media_id", "alt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 10L, "cat"), (2L, 11L, "dog"),
      (3L, 12L, "fox")), s"got $got")
  }

  test("imageAltPairs: quote-adjacent attrs and empty values (ADVICE r15)") {
    import spark.implicits._
    val pages = Seq(
      // browser-tolerated markup: no separator after a quoted value
      (1L, """<img alt="cat"src="https://e.org/a.png">"""),
      // empty quoted src -> tag drops (no value to join), never mis-binds
      // to a LATER unquoted token
      (2L, """<img src="" alt="ghost">"""),
      // empty alt -> drops (pairs need text), even with a valid src
      (3L, """<img src="https://e.org/b.png" alt="">"""),
      // data-src still never shadows src when quote-adjacent
      (4L, """<img alt="dog"data-src="https://e.org/lazy.png" src="https://e.org/b.png">"""))
      .toDF("page_id", "html")
    val images = Seq(
      (10L, "https://e.org/a.png"), (11L, "https://e.org/b.png"),
      (13L, "https://e.org/lazy.png")).toDF("media_id", "url")
    val got = Multimodal.imageAltPairs(pages, "page_id", "html", images, "url")
      .select("page_id", "media_id", "alt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == Set((1L, 10L, "cat"), (4L, 11L, "dog")), s"got $got")
  }
}
