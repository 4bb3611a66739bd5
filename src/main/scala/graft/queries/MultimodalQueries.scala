package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal-column surface: the `documents` table doubles as a media
  * table (kind assigned round-robin by id). Image-kind rows carry REAL
  * encoded containers (stored-block PNG / JDK baseline JPEG) and their
  * metadata comes from a real header parse
  * ([[Multimodal.ImageHeader]]); audio/video payloads remain the
  * documented deterministic stub ([[Multimodal.FakeCodec]] — no audio
  * codec ships in this environment), so their oracles recompute the
  * same pseudo-metadata from byte length / byte values with DuckDB
  * blob functions — which exercises the real part either way: schema,
  * batching, explode shapes, and metadata propagation. Text payloads
  * are ASCII (verified), so ord(char) == byte value on both engines. */
object MultimodalQueries {

  private def kindExpr: Column =
    when(col("doc_id") % 3 === 0, "image")
      .when(col("doc_id") % 3 === 1, "audio")
      .otherwise("video")

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.asMediaTable(
      graft.Tables.table(s, dir, "documents"), "doc_id", "text", kindExpr)

  /** [[media]] with the under-partitioned-scan rebalance applied
    * (graft.operators.Spread): every fixture below runs a per-row
    * codec ENCODE before handing the frame to a per-row DECODE
    * operator, and both cost CPU per ROW while scan partitioning is
    * sized per BYTE — off a single-file documents scan the whole
    * chain otherwise runs as one task (the r19 sf10 video finding,
    * measured again for this family in r20). No-op when the scan
    * already yields >= shuffle.partitions splits, so a real
    * multi-split corpus shuffles nothing. `mm_image_dims`
    * DELIBERATELY stays on the un-spread [[media]]: it is a pinned
    * calibration probe (re-anchoring is an epoch change) and its
    * kernel is a header parse cheap enough that the shuffle would
    * lose.  */
  private def mediaSpread(s: SparkSession, dir: String): DataFrame =
    graft.operators.Spread.rebalanced(
      media(s, dir).select("media_id", "kind", "bytes"))

  /** The oracle replay of [[videoDedupFixture]] + scene segmentation
    * + per-scene-rep dHash, shared by the `mm_video_neardup` and
    * `mm_video_signature` oracles: frames from the planted formula,
    * block-granular diffs (block-constant frames: per-pixel mean =
    * block sum // 72), scene prefix sums, rep = first frame of each
    * scene, dHash bits straight off the blocks (72x64 makes the 9x8
    * cells == DC blocks), packed into hi/lo + 16-hex. Ends at
    * `rep(media_id, scene, rep)` and `hx(media_id, scene, hi, lo, dh)`. */
  private def videoSigCtes: String =
    s"""vids AS (SELECT doc_id AS media_id,
             (doc_id // 3) // 4 AS g, (doc_id // 3) % 4 AS role
           FROM documents WHERE doc_id % 3 = 0),
         v2 AS (SELECT media_id, role,
             CASE WHEN role = 3 THEN g * 1009 + 7 ELSE g END AS gx,
             3 + (g % 3) AS ns,
             CASE WHEN role = 1 THEN 1 ELSE 0 END AS s0
           FROM vids),
         fr AS (SELECT media_id, role, gx,
             s0 + (f.f // 2) AS sp, (f.f % 2) AS wig,
             CAST(f.f AS BIGINT) AS fi
           FROM v2, LATERAL unnest(range(0, (ns - s0) * 2)) AS f(f)),
         blk AS (SELECT media_id, fi, bx.bx AS bx, by.by AS by,
             20 + (gx * 37 + sp * 53) % 90 +
               (bx.bx * (3 + (gx * 7 + sp * 3) % 23) +
                by.by * (5 + (gx * 11 + sp * 5) % 19) +
                ((gx * 29 + sp * 71) % 90) * (bx.bx * by.by + 1)) % 90 +
               wig + CASE WHEN role = 2 THEN 4 ELSE 0 END AS v
           FROM fr, LATERAL unnest(range(0, 9)) AS bx(bx),
                LATERAL unnest(range(0, 8)) AS by(by)),
         dfm AS (SELECT a.media_id, a.fi,
             (sum(abs(a.v - b.v)) // 72) AS mean_diff
           FROM blk a JOIN blk b ON b.media_id = a.media_id
             AND b.fi = a.fi - 1 AND b.bx = a.bx AND b.by = a.by
           GROUP BY 1, 2),
         fs AS (SELECT DISTINCT media_id, fi FROM blk),
         sc AS (SELECT fs.media_id, fs.fi,
             sum(CASE WHEN d.mean_diff > 16 THEN 1 ELSE 0 END)
               OVER (PARTITION BY fs.media_id ORDER BY fs.fi) AS scene
           FROM fs LEFT JOIN dfm d
             ON d.media_id = fs.media_id AND d.fi = fs.fi),
         rep AS (SELECT media_id, scene, min(fi) AS rep
           FROM sc GROUP BY 1, 2),
         bits AS (SELECT r.media_id, r.scene, (a.by * 8 + a.bx) AS k,
             CASE WHEN a.v < b.v THEN 1 ELSE 0 END AS bit
           FROM rep r
           JOIN blk a ON a.media_id = r.media_id AND a.fi = r.rep
           JOIN blk b ON b.media_id = r.media_id AND b.fi = r.rep
             AND b.by = a.by AND b.bx = a.bx + 1
           WHERE a.bx < 8),
         packed AS (SELECT media_id, scene,
             CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k)
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1, 2),
         hx AS (SELECT media_id, scene, hi, lo,
             printf('%08x%08x', hi, lo) AS dh FROM packed)"""

  /** The banded-candidate + hamming-verify CTEs over [[videoSigCtes]]'
    * `hx` — the oracle replay of the engine's scene-pair core, shared
    * by the `mm_video_neardup` and `mm_video_align` oracles. Ends at
    * `ham(id_a, scene_a, id_b, scene_b, hi/lo pairs)`. */
  private def videoHamCtes: String =
    s"""cand AS (SELECT DISTINCT a.media_id AS id_a, a.scene AS scene_a,
             b.media_id AS id_b, b.scene AS scene_b,
             a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
           FROM hx a JOIN hx b ON b.media_id > a.media_id AND (
             substr(a.dh, 1, 4) = substr(b.dh, 1, 4)
             OR substr(a.dh, 5, 4) = substr(b.dh, 5, 4)
             OR substr(a.dh, 9, 4) = substr(b.dh, 9, 4)
             OR substr(a.dh, 13, 4) = substr(b.dh, 13, 4))),
         ham AS (SELECT * FROM cand
           WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 3)"""

  /** The video-dedup fixture shared by `mm_video_neardup` and
    * `mm_video_signature`: image-kind rows become 72x64 MJPEG AVIs
    * (block-aligned dims → the 9x8 dHash cells ARE the DC blocks, so
    * every hash bit is the planted block formula) in groups of four
    * consecutive image rows — role 0 base, role 1 TRIMMED copy (first
    * scene dropped + different frame rate), role 2 RE-ENCODED copy
    * (+4 global brightness: dHash exactly invariant, bytes not),
    * role 3 a distinct video (gradient family reseeded via gx). */
  private def videoDedupFixture(s: SparkSession, d: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.BINARY)
    // the AVI ENCODE below is as per-row-CPU-heavy as the decode it
    // feeds; without the spread, a single-file documents scan builds
    // every clip on one core (the r19 sf10 finding)
    mediaSpread(s, d)
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        it.map { r =>
          val id = r.getLong(0); val kind = r.getString(1)
          val payload =
            if (kind == "image") {
              val k = id / 3 // image rows are the doc_id % 3 == 0 lane
              val g = k / 4
              val role = (k % 4).toInt
              val gx = if (role == 3) g * 1009L + 7L else g
              val nS = 3 + (g % 3).toInt
              val s0 = if (role == 1) 1 else 0
              val frames = (s0 until nS).flatMap { spi =>
                val sp = spi.toLong
                (0 to 1).map { wig =>
                  graft.operators.JpegCodec.encodeJpegDcOnly(72, 64,
                    (bx, by) => {
                      val mx = 3L + (gx * 7 + sp * 3) % 23
                      val my = 5L + (gx * 11 + sp * 5) % 19
                      val q = (gx * 29 + sp * 71) % 90
                      (20L + (gx * 37 + sp * 53) % 90 +
                        (bx * mx + by * my + q * (bx * by + 1)) % 90 +
                        wig + (if (role == 2) 4 else 0)).toInt
                    })
                }
              }
              graft.sources.Avi.encodeMjpeg(72, 64,
                33000 + role * 3000, frames)
            } else r.getAs[Array[Byte]](2)
          (id, kind, payload)
        }
      }(enc).toDF("media_id", "kind", "bytes")
  }

  /** media(), with every image-kind payload replaced by a REAL PNG
    * (zlib stored blocks, [[Multimodal.ImageHeader.encodePngStored]])
    * whose dimensions derive from the id — so decodeMeta exercises the
    * real header parser and the oracle predicts every field by
    * arithmetic (total PNG length = 68 + h*(w+1) by construction). */
  private def mediaRealImages(s: SparkSession, dir: String): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.BINARY)
    media(s, dir).select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
        it.map { r =>
          val id = r.getLong(0); val kind = r.getString(1)
          val payload =
            if (kind == "image") {
              val w = 8 + (id % 57).toInt
              val h = 8 + (id * 3 % 57).toInt
              Multimodal.ImageHeader.encodePngStored(w, h,
                (x, y) => ((id * 31 + x * 7 + y * 13) % 251).toInt)
            } else r.getAs[Array[Byte]](2)
          (id, kind, payload)
        }
      }(enc).toDF("media_id", "kind", "bytes")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_decode_meta" -> ((s, d) => Multimodal.decodeMeta(mediaRealImages(s, d))),
    // real-container dimension parse over all FOUR formats: every doc
    // becomes an actual encoded image (id mod 4: stored-PNG, JDK
    // baseline JPEG, uncompressed-LZW GIF89a, 24-bit BMP); the parsed
    // width/height must equal the encode-time values the oracle
    // recomputes from the id
    "mm_image_dims" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = media(s, d).select("media_id", "kind", "bytes")
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0)
            val w = 8 + (id * 7 % 64).toInt
            val h = 8 + (id * 13 % 64).toInt
            def pix(x: Int, y: Int) = ((id * 31 + x * 7 + y * 13) % 251).toInt
            val payload = (id % 4) match {
              case 0 => Multimodal.ImageHeader.encodePngStored(w, h, pix)
              case 1 => Multimodal.ImageHeader.encodeJpeg(w, h, pix)
              case 2 => Multimodal.ImageHeader.encodeGif(w, h, pix)
              case _ => Multimodal.ImageHeader.encodeBmp(w, h, pix)
            }
            (id, "image", payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.decodeMeta(imgs)
        .select(col("media_id"), col("width"), col("height"))
    }),
    "mm_feature_cksum" -> ((s, d) =>
      Multimodal.extractFeatures(media(s, d))
        .select("media_id", "n_bytes", "checksum")),
    // full feature vectors, rendered as an exact integer CSV: the fake
    // plane features are sign-extended bytes (whole-valued floats), so
    // casting each to int loses nothing and gives a scalar string the
    // driver can hash (a raw float array is unhashable on the pandas
    // side, CORRECTNESS_r01 'unhashable type: numpy.ndarray') and the
    // oracle can recompute byte-for-byte
    "mm_features" -> ((s, d) =>
      Multimodal.extractFeatures(media(s, d))
        .select(col("media_id"), col("n_bytes"), col("checksum"),
          concat_ws(",", transform(col("feature"), f => f.cast("int")))
            .as("feature_csv"))),
    "mm_frame_sample" -> ((s, d) =>
      // frame bytes are ASCII here -> inspect via string cast
      Multimodal.sampleFrames(media(s, d), everyK = 4, frameBytes = 32)
        .select(col("media_id"), col("frame_idx").cast("long").as("frame_idx"),
          length(col("frame_bytes")).cast("long").as("frame_len"),
          ascii(col("frame_bytes").cast("string")).cast("long").as("first_byte"))),
    "mm_audio_segments" -> ((s, d) =>
      // 400-sample windows, 160-sample hop; segments inspected via
      // ASCII-safe casts like mm_frame_sample
      Multimodal.segmentAudio(media(s, d), windowSamples = 400, hopSamples = 160)
        .select(col("media_id"), col("seg_idx").cast("long").as("seg_idx"),
          length(col("seg_bytes")).cast("long").as("seg_len"),
          ascii(col("seg_bytes").cast("string")).cast("long").as("first_byte"))),
    // REAL audio decode: every audio-kind id gets an actual RIFF/WAV
    // PCM16 payload whose samples derive from the id, the operator
    // parses the container and windows the PCM, and the oracle
    // recomputes every integer stat from the same sample formula —
    // the mm_image_dims pattern, for sound
    // REAL pixels through the full LZW decoder: image rows carry
    // GIF89a payloads whose pixels derive from the id; the codec
    // being lossless, the oracle recomputes every stat from the same
    // pixel formula — encode -> LZW decode -> analyze, exact
    "mm_gif_pixels" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val gifs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                Multimodal.ImageHeader.encodeGif(w, h,
                  (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imagePixelStats(gifs)
    }),
    // the same real-pixels contract through the PNG path: stored-zlib
    // fixtures, the full inflate + un-filter decoder; same formula,
    // same oracle shape
    "mm_png_pixels" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val pngs = media(s, d).select("media_id", "kind", "bytes")
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                // even ids Adam7-interlaced, odd ids linear — same
                // pixel formula either way, so one oracle covers both
                // decoder paths
                if (id % 2 == 0)
                  Multimodal.ImageHeader.encodePngStoredInterlaced(w, h,
                    (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
                else
                  Multimodal.ImageHeader.encodePngStored(w, h,
                    (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imagePixelStats(pngs)
    }),
    // real pixels through the full JPEG baseline decoder (markers,
    // canonical Huffman, DC prediction, IDCT, restart markers — odd
    // ids also exercise the RSTn path): DC-only fixtures are the one
    // JPEG class EVERY conforming decoder reproduces exactly
    // (operators/Jpeg.scala scaladoc), so pixel(x,y) =
    // blockVal(x/8, y/8) is a formula oracle over real entropy-coded
    // bytes; byte-identity on lossy content is pinned by
    // JpegCodecSpec against the JDK decoder instead
    "mm_jpeg_pixels" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val jpgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                graft.operators.JpegCodec.encodeJpegDcOnly(w, h,
                  (bx, by) => ((id * 31 + bx * 7 + by * 13) % 256).toInt,
                  restartInterval = if (id % 2 == 1) 1 + (id % 5).toInt else 0)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imagePixelStats(jpgs)
    }),
    // cross-FORMAT perceptual dedup: consecutive image ids share a
    // content seed (id/9) but rotate container format (id/3 mod 3:
    // GIF / PNG / DC-only JPEG), so each triple decodes to identical
    // pixels through three different real codecs and MUST collide in
    // dHash — the dedup a real multimodal pipeline wants (same photo
    // re-encoded). Block-constant content keeps the JPEG leg exact;
    // the oracle replays the integer 9x8-grid gradient hash
    "mm_image_dedup_dhash" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val seed = id / 9
                val w = 16 + (seed % 24).toInt
                val h = 10 + (seed % 15).toInt
                def bv(bx: Int, by: Int) =
                  ((seed * 31 + bx * 7 + by * 13) % 256).toInt
                def pix(x: Int, y: Int) = bv(x / 8, y / 8)
                ((id / 3) % 3) match {
                  case 0 => Multimodal.ImageHeader.encodeGif(w, h, pix)
                  case 1 => Multimodal.ImageHeader.encodePngStored(w, h, pix)
                  case _ => graft.operators.JpegCodec.encodeJpegDcOnly(w, h, bv)
                }
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imageDHash(imgs)
    }),
    // DCT perceptual hash over the same cross-format triple plant
    // (content seed id/9, container rotation GIF / PNG / DC-only JPEG
    // by id/3 mod 3) at pHash-legal dims (>= 32x32): the frequency-
    // domain hash must collide across containers; the oracle replays
    // box-mean grid, Q14 DCT (the Scala table interpolated verbatim —
    // no cross-engine trig), median threshold, and bit packing
    "mm_image_phash" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val seed = id / 9
                val w = 40 + (seed % 24).toInt
                val h = 36 + (seed % 15).toInt
                def bv(bx: Int, by: Int) =
                  ((seed * 31 + bx * 7 + by * 13) % 256).toInt
                def pix(x: Int, y: Int) = bv(x / 8, y / 8)
                ((id / 3) % 3) match {
                  case 0 => Multimodal.ImageHeader.encodeGif(w, h, pix)
                  case 1 => Multimodal.ImageHeader.encodePngStored(w, h, pix)
                  case _ => graft.operators.JpegCodec.encodeJpegDcOnly(w, h, bv)
                }
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imagePHash(imgs)
    }),
    // reunite-the-photo dedup: image pairs share a content seed
    // (id/6); the first member stores upright (PNG, no tag), the
    // second stores the pixels PHYSICALLY ROTATED 90CW at swapped
    // dims with EXIF orientation 6 riding a real JPEG APP1 (dims
    // multiples of 8 keep the rotated blocks DC-exact). After the
    // dihedral normalization both pHash to the same value — the
    // oracle computes BOTH members' hashes from the UPRIGHT formula,
    // so it only matches if the normalization was exact
    "mm_orient_phash_dedup" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val seed = id / 6
                val w = 40 + 8 * (seed % 3).toInt // upright dims, mult of 8
                val h = 32 + 8 * (seed % 2).toInt
                def bvUp(bi: Int, bj: Int) =
                  ((seed * 31 + bi * 7 + bj * 13) % 256).toInt
                if ((id / 3) % 2 == 0)
                  Multimodal.ImageHeader.encodePngStored(w, h,
                    (x, y) => bvUp(x / 8, y / 8))
                else {
                  // stored 90CW: dims (h, w), stored block (bx, by) =
                  // upright block (w/8 - 1 - by, bx); tag o = 6
                  val tiff = graft.operators.Exif.encodeTiff(
                    littleEndian = true, orientation = 6,
                    make = "C", model = "M", gps = None)
                  val base = graft.operators.JpegCodec.encodeJpegDcOnly(
                    h, w, (bx, by) => bvUp(w / 8 - 1 - by, bx))
                  base.take(2) ++
                    graft.operators.Exif.encodeJpegApp1(tiff) ++
                    base.drop(2)
                }
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.orientNormalizedPHash(imgs)
    }),
    // Hamming near-dup pairs over the DCT hash (the X182 recipe on
    // the stronger hash): pair members share a seed; the second gets
    // a +15 corner bump (few low-frequency bits move) except every
    // 4th seed, whose second member is INVERTED (AC signs flip ->
    // far); the oracle replays full pHash per member variant, the
    // OR-of-band-equality candidate rule, and the popcount verify
    "mm_image_neardup_phash" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val seed = id / 6
                val w = 40 + (seed % 24).toInt
                val h = 36 + (seed % 15).toInt
                def base(x: Int, y: Int) =
                  ((seed * 31 + (x / 4) * 7 + (y / 4) * 13) % 200).toInt
                val member = (id / 3) % 2
                def pix(x: Int, y: Int): Int =
                  if (member == 0L) base(x, y)
                  else if (seed % 4 == 0) 255 - base(x, y)
                  else base(x, y) + (if (x < 12 && y < 12) 15 else 0)
                Multimodal.ImageHeader.encodePngStored(w, h, pix)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imagePHashNearDupPairs(imgs, maxHamming = 16,
        maxAvgCandidatesPerRow = graft.operators.Guard.budget(
          s, "dhashMaxAvgCandidatesPerRow", 256.0))
    }),
    // Hamming NEAR-dup pairs over the perceptual hash (X4's banded
    // recipe with an EXACT oracle — the text SimHash query is
    // rows-only): image pairs share a content seed (id/6); the second
    // member carries a local +16 corner perturbation (flips a few
    // gradient bits -> reported) except every 4th seed, whose second
    // member is INVERTED (flips ~all bits -> correctly absent). The
    // oracle replays hash, bands, and bit_count in DuckDB
    "mm_image_neardup_dhash" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val seed = id / 6
                val w = 16 + (seed % 24).toInt
                val h = 10 + (seed % 15).toInt
                def base(x: Int, y: Int) = ((seed * 31 + x * 7 + y * 13) % 200).toInt
                val member = (id / 3) % 2
                def pix(x: Int, y: Int): Int =
                  if (member == 0L) base(x, y)
                  else if (seed % 4 == 0) 255 - base(x, y)
                  else base(x, y) + (if (x < 8 && y < 8) 16 else 0)
                Multimodal.ImageHeader.encodePngStored(w, h, pix)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imageNearDupPairs(imgs, maxHamming = 8,
        maxAvgCandidatesPerRow = graft.operators.Guard.budget(
          s, "dhashMaxAvgCandidatesPerRow", 256.0))
    }),
    // the multimodal CRAWL composition: docs pack into multi-record
    // WARC files (doc_warc_extract's 10-records/file + every-4th-
    // gzip-member layout) where image-kind ids carry REAL encoded
    // containers (GIF/PNG/DC-JPEG by id/3 mod 3, content triples by
    // seed id/9) under image/* HTTP content types and the crawl's
    // status formula; the pipeline is the real ingest shape: strict
    // WARC parse -> status-200 gate -> content-type routing -> real
    // pixel decode -> perceptual dHash -> cross-format dup counts.
    // Every stage replays in the oracle (status + dims + grid hash)
    "mm_warc_image_pipeline" -> ((s, d) => {
      import s.implicits._
      val grouped = graft.Tables.table(s, d, "documents")
        .select(expr("doc_id div 10").as("file_id"),
          struct(col("doc_id"), col("text")).as("r"))
        .groupBy(col("file_id"))
        .agg(sort_array(collect_list(col("r"))).as("rs"))
      val survivors = grouped.flatMap { row =>
        val bytes = row.getSeq[org.apache.spark.sql.Row](1).flatMap { r =>
          val id = r.getLong(0)
          // decorrelated from id%3 (unlike doc_warc_extract's formula,
          // whose multiplier is 1 mod 3) so the 200-gate REALLY drops
          // ~40% of the image records
          val q = (id * 31 + 7) % 5
          val (st, stx) =
            if (q < 3) (200, "OK")
            else if (q == 3L) (301, "Moved")
            else (404, "NotFound")
          val (body, ctype) =
            if (id % 3 == 0) {
              val seed = id / 9
              val w = 16 + (seed % 24).toInt
              val h = 10 + (seed % 15).toInt
              def bv(bx: Int, by: Int) =
                ((seed * 31 + bx * 7 + by * 13) % 256).toInt
              def pix(x: Int, y: Int) = bv(x / 8, y / 8)
              ((id / 3) % 3) match {
                case 0 => (Multimodal.ImageHeader.encodeGif(w, h, pix), "image/gif")
                case 1 => (Multimodal.ImageHeader.encodePngStored(w, h, pix), "image/png")
                case _ => (graft.operators.JpegCodec.encodeJpegDcOnly(w, h, bv), "image/jpeg")
              }
            } else
              (r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8),
                "text/plain")
          val rec = graft.sources.Warc.encodeResponse(
            s"https://ex.org/d/$id", "2026-08-15T00:00:00Z", st, stx, body, ctype)
          (if (id % 4 == 0) graft.sources.Warc.gzipMember(rec) else rec).toSeq
        }.toArray
        graft.sources.Warc.parseAll(bytes)
          .filter(w => w.httpStatus == 200 &&
            w.httpContentType.startsWith("image/"))
          .map { w =>
            val id = w.targetUri.substring(w.targetUri.lastIndexOf('/') + 1).toLong
            (id, w.httpContentType, w.body)
          }
      }.toDF("media_id", "container", "bytes")
      // the hash side and the container join-back both consume the
      // parse output, so the WARC parse executes twice — MEASURED as
      // the right trade: materializing survivors once (the text
      // pipeline's discipline) checkpoints the image BYTES and costs
      // 40.8 s at sf10 vs 6.18 s for the double parse (PLANS.md r14
      // entry) — the text pipelines materialize because EIGHT
      // consumers follow; here it's two consumers of a cheap map
      val hashed = Multimodal.imageDHash(
        survivors.select(col("media_id"), lit("image").as("kind"), col("bytes")))
      hashed.join(survivors.select("media_id", "container"), "media_id")
        .select("media_id", "container", "width", "height", "dhash", "n_same_hash")
    }),
    // VLM image-text PAIR MINING from the crawl: pages (text/html,
    // id%3==1) carry <img> tags whose src references the PREVIOUS
    // id's real encoded image — with tracking params attached, so the
    // join only works through the canonical-URL chain; images
    // (id%3==0, GIF/PNG/DC-JPEG rotation) decode for real; both legs
    // run their own status gate, so pairs survive only when page AND
    // image fetched 200 — exactly the construction a VLM training set
    // starts from. Oracle replays gates, alt strings, dims, and the
    // per-container pixel sums
    "mm_image_text_pairs" -> ((s, d) => {
      import s.implicits._
      val grouped = graft.Tables.table(s, d, "documents")
        .select(expr("doc_id div 10").as("file_id"),
          struct(col("doc_id"), col("text")).as("r"))
        .groupBy(col("file_id"))
        .agg(sort_array(collect_list(col("r"))).as("rs"))
      val records = grouped.flatMap { row =>
        val bytes = row.getSeq[org.apache.spark.sql.Row](1).flatMap { r =>
          val id = r.getLong(0)
          val q = (id * 31 + 7) % 5
          val (st, stx) =
            if (q < 3) (200, "OK")
            else if (q == 3L) (301, "Moved")
            else (404, "NotFound")
          val (body, ctype, uri) =
            if (id % 3 == 0) {
              val w = 16 + (id % 24).toInt
              val h = 10 + (id % 15).toInt
              def bv(bx: Int, by: Int) =
                ((id * 31 + bx * 7 + by * 13) % 256).toInt
              def pix(x: Int, y: Int) = bv(x / 8, y / 8)
              val img = ((id / 3) % 3) match {
                case 0 => Multimodal.ImageHeader.encodeGif(w, h, pix)
                case 1 => Multimodal.ImageHeader.encodePngStored(w, h, pix)
                case _ => graft.operators.JpegCodec.encodeJpegDcOnly(w, h, bv)
              }
              (img, "image/gif", s"https://ex.org/img/$id")
            } else if (id % 3 == 1) {
              val ref = id - 1 // the previous id, always % 3 == 0
              val html = s"""<html><body><p>page $id</p>""" +
                s"""<img src="https://ex.org/img/$ref?utm_source=feed&utm_campaign=x" """ +
                s"""alt="img $ref page $id"></body></html>"""
              (html.getBytes(java.nio.charset.StandardCharsets.UTF_8),
                "text/html", s"https://ex.org/page/$id")
            } else
              (r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8),
                "text/plain", s"https://ex.org/d/$id")
          val rec = graft.sources.Warc.encodeResponse(
            uri, "2026-08-15T00:00:00Z", st, stx, body, ctype)
          (if (id % 4 == 0) graft.sources.Warc.gzipMember(rec) else rec).toSeq
        }.toArray
        graft.sources.Warc.parseAll(bytes)
          .filter(_.httpStatus == 200)
          .map { w0 =>
            val id = w0.targetUri.substring(w0.targetUri.lastIndexOf('/') + 1).toLong
            (id, w0.targetUri, w0.httpContentType,
              if (w0.httpContentType.startsWith("text/html"))
                new String(w0.body, java.nio.charset.StandardCharsets.UTF_8)
              else "",
              if (w0.httpContentType.startsWith("image/")) w0.body
              else Array.emptyByteArray)
          }
      }.toDF("rec_id", "uri", "ctype", "html", "img_bytes")
      val pages = records.filter(col("ctype").startsWith("text/html"))
        .select(col("rec_id").as("page_id"), col("html"))
      val images = records.filter(col("ctype").startsWith("image/"))
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val (w, h, px) = Multimodal.decodeImage(r.getAs[Array[Byte]](4))
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (r.getLong(0), r.getString(1), w, h, sum)
          }
        }(org.apache.spark.sql.Encoders.tuple(
          org.apache.spark.sql.Encoders.scalaLong,
          org.apache.spark.sql.Encoders.STRING,
          org.apache.spark.sql.Encoders.scalaInt,
          org.apache.spark.sql.Encoders.scalaInt,
          org.apache.spark.sql.Encoders.scalaLong))
        .toDF("media_id", "url", "width", "height", "sum_gray")
      Multimodal.imageAltPairs(pages, "page_id", "html", images, "url")
        .select("media_id", "page_id", "alt", "width", "height", "sum_gray")
    }),
    // the PRIVACY-COMPLETE crawl composition — X183's pipeline with
    // the round's detection/scrub/normalize stages fused in: WARC
    // parse -> status-200 + image/* gate -> EXIF detect (real TIFF
    // walk; which survivors carry GPS) -> container-appropriate
    // metadata strip (JPEG APP1+COM / PNG tEXt+eXIf / GIF
    // Comment+Application) -> re-detect must find NOTHING (enforced
    // per row — the pipeline self-checks its scrub) -> transcode to
    // canonical stored-PNG -> dHash over the NORMALIZED bytes ->
    // cross-format dup counts. Stages share ONE flatMap (the hash is
    // computed inline via dHashOf), so the only exchange is the
    // count window; every output column — strip byte delta included,
    // which prices the real TIFF the fixture injected — replays
    // arithmetically in the oracle
    "mm_warc_privacy_pipeline" -> ((s, d) => {
      import s.implicits._
      val grouped = graft.Tables.table(s, d, "documents")
        .select(expr("doc_id div 10").as("file_id"),
          struct(col("doc_id"), col("text")).as("r"))
        .groupBy(col("file_id"))
        .agg(sort_array(collect_list(col("r"))).as("rs"))
      val rows = grouped.flatMap { row =>
        val bytes = row.getSeq[org.apache.spark.sql.Row](1).flatMap { r =>
          val id = r.getLong(0)
          val q = (id * 31 + 7) % 5
          val (st, stx) =
            if (q < 3) (200, "OK")
            else if (q == 3L) (301, "Moved")
            else (404, "NotFound")
          val (body, ctype) =
            if (id % 3 == 0) {
              val seed = id / 9
              val w = 16 + (seed % 24).toInt
              val h = 10 + (seed % 15).toInt
              def bv(bx: Int, by: Int) =
                ((seed * 31 + bx * 7 + by * 13) % 256).toInt
              def pix(x: Int, y: Int) = bv(x / 8, y / 8)
              val gps =
                if (id % 9 < 6)
                  Some(graft.operators.Exif.GpsDms(
                    if ((id / 9) % 2 == 0) 'N' else 'S',
                    (id % 90).toInt, (id % 60).toInt, ((id * 7) % 60).toInt,
                    if ((id / 18) % 2 == 0) 'E' else 'W',
                    ((id * 3) % 180).toInt, ((id * 5) % 60).toInt,
                    ((id * 11) % 60).toInt))
                else None
              def tiff = graft.operators.Exif.encodeTiff(
                littleEndian = id % 2 == 0, orientation = 1 + (id % 8).toInt,
                make = "Cam" + (id % 10), model = "Mod" + (id % 100), gps)
              ((id / 3) % 3) match {
                case 0 =>
                  // GIF + Comment + Application extensions (no EXIF slot)
                  val base = Multimodal.ImageHeader.encodeGif(w, h, pix)
                  val l1 = 40 + (id % 100).toInt
                  val l2 = 20 + (id % 60).toInt
                  def sub(n: Int, off: Int): Array[Byte] =
                    n.toByte +: Array.tabulate(n)(k => ((id + off + k) % 251).toByte)
                  val comment = Array[Byte](0x21, 0xfe.toByte) ++ sub(l1, 0) ++
                    Array[Byte](0)
                  val app = Array[Byte](0x21, 0xff.toByte) ++
                    sub(11, 7) ++ sub(l2, 13) ++ Array[Byte](0)
                  val at = 13 + 3 * (1 << ((base(10) & 7) + 1))
                  (base.take(at) ++ comment ++ app ++ base.drop(at), "image/gif")
                case 1 =>
                  // PNG + tEXt + eXIf (the real TIFF) after IHDR
                  val base = Multimodal.ImageHeader.encodePngStored(w, h, pix)
                  val l1 = 32 + (id % 64).toInt
                  def chunk(tag: String, data: Array[Byte]): Array[Byte] = {
                    val n = data.length
                    val a = new Array[Byte](12 + n)
                    a(0) = (n >> 24).toByte; a(1) = (n >> 16).toByte
                    a(2) = (n >> 8).toByte; a(3) = n.toByte
                    tag.getBytes("US-ASCII").copyToArray(a, 4)
                    data.copyToArray(a, 8)
                    val crc = new java.util.zip.CRC32
                    crc.update(a, 4, 4 + n)
                    val c = crc.getValue
                    a(8 + n) = (c >> 24).toByte; a(9 + n) = (c >> 16).toByte
                    a(10 + n) = (c >> 8).toByte; a(11 + n) = c.toByte
                    a
                  }
                  val txt = chunk("tEXt",
                    Array.tabulate(l1)(k => ((id + k * 7) % 251).toByte))
                  (base.take(33) ++ txt ++
                    chunk("eXIf", tiff) ++ base.drop(33), "image/png")
                case _ =>
                  // DC-only JPEG + APP1(EXIF TIFF) + COM
                  val base = graft.operators.JpegCodec.encodeJpegDcOnly(w, h, bv)
                  val l2 = 16 + (id % 32).toInt
                  val com = {
                    val a = new Array[Byte](4 + l2)
                    a(0) = 0xff.toByte; a(1) = 0xfe.toByte
                    a(2) = (((l2 + 2) >> 8) & 0xff).toByte
                    a(3) = ((l2 + 2) & 0xff).toByte
                    var i = 0
                    while (i < l2) { a(4 + i) = ((id + i) % 251).toByte; i += 1 }
                    a
                  }
                  (base.take(2) ++ graft.operators.Exif.encodeJpegApp1(tiff) ++
                    com ++ base.drop(2), "image/jpeg")
              }
            } else
              (r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8),
                "text/plain")
          val rec = graft.sources.Warc.encodeResponse(
            s"https://ex.org/d/$id", "2026-08-15T00:00:00Z", st, stx, body, ctype)
          (if (id % 4 == 0) graft.sources.Warc.gzipMember(rec) else rec).toSeq
        }.toArray
        graft.sources.Warc.parseAll(bytes)
          .filter(w => w.httpStatus == 200 &&
            w.httpContentType.startsWith("image/"))
          .map { w =>
            val id = w.targetUri.substring(w.targetUri.lastIndexOf('/') + 1).toLong
            val (container, exif) = graft.operators.Exif.fromImage(w.body)
            val hadGps = exif.exists(_.hasGps)
            val (stripped, _) = container match {
              case "jpeg" => graft.operators.JpegCodec.stripMetadata(w.body)
              case "png" => Multimodal.PngCodec.stripMetadata(w.body)
              case "gif" => Multimodal.GifCodec.stripMetadata(w.body)
              case other => throw new IllegalStateException(
                s"unexpected container $other in crawl pipeline")
            }
            // the scrub must actually have worked — per-row self-check
            if (graft.operators.Exif.fromImage(stripped)._2.nonEmpty)
              throw new IllegalStateException(
                s"EXIF survived the $container strip (media $id)")
            val (iw, ih, px) = Multimodal.decodeImage(stripped)
            val png = Multimodal.PngCodec.encodeRgb(iw, ih, px)
            val (nw, nh, npx) = Multimodal.PngCodec.decode(png)
            (id, container, hadGps,
              (w.body.length - stripped.length).toLong, png.length.toLong,
              Multimodal.dHashOf(nw, nh, npx))
          }
      }.toDF("media_id", "container", "had_gps", "n_stripped_bytes",
        "out_len", "dhash")
      rows.withColumn("n_same_hash",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("dhash"))).cast("long"))
    }),
    // privacy scrub: image ids carry DC-only JPEGs with an injected
    // APP1 (EXIF-slot) and COM segment of id-derived lengths; the
    // marker-walk strip removes exactly those (arithmetic byte
    // delta), and the stripped file still decodes to the exact block
    // formula — metadata gone, pixels untouched, no decode in the
    // strip itself
    "mm_jpeg_strip_meta" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.product[
        (Long, Long, Long, Int, Int, Long)]
      graft.operators.Spread.rebalanced(
        media(s, d).filter(col("kind") === "image").select("media_id"))
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0)
            val w = 16 + (id % 24).toInt
            val h = 10 + (id % 15).toInt
            val base = graft.operators.JpegCodec.encodeJpegDcOnly(w, h,
              (bx, by) => ((id * 31 + bx * 7 + by * 13) % 256).toInt)
            val l1 = 64 + (id % 128).toInt // APP1 payload bytes
            val l2 = 16 + (id % 32).toInt  // COM payload bytes
            def seg(marker: Int, n: Int): Array[Byte] = {
              val a = new Array[Byte](4 + n)
              a(0) = 0xff.toByte; a(1) = marker.toByte
              a(2) = (((n + 2) >> 8) & 0xff).toByte; a(3) = ((n + 2) & 0xff).toByte
              var i = 0
              while (i < n) { a(4 + i) = ((id + i) % 251).toByte; i += 1 }
              a
            }
            val withMeta = base.take(2) ++ seg(0xe1, l1) ++ seg(0xfe, l2) ++ base.drop(2)
            val (stripped, nSeg) = graft.operators.JpegCodec.stripMetadata(withMeta)
            val (dw, dh, px) = graft.operators.JpegCodec.decode(stripped)
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (id, (withMeta.length - stripped.length).toLong, nSeg.toLong,
              dw, dh, sum)
          }
        }(enc).toDF("media_id", "n_stripped_bytes", "n_segments_stripped",
          "width", "height", "sum_gray")
    }),
    // the GIF leg of the scrub trio: inject a Comment and an
    // Application extension (the XMP carrier) after the color table,
    // strip, and prove blocks gone + pixels untouched arithmetically
    "mm_gif_strip_meta" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.product[
        (Long, Long, Long, Int, Int, Long)]
      graft.operators.Spread.rebalanced(
        media(s, d).filter(col("kind") === "image").select("media_id"))
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0)
            val w = 16 + (id % 24).toInt
            val h = 10 + (id % 15).toInt
            val base = Multimodal.ImageHeader.encodeGif(w, h,
              (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
            val l1 = 40 + (id % 100).toInt
            val l2 = 20 + (id % 60).toInt
            def sub(n: Int, off: Int): Array[Byte] =
              n.toByte +: Array.tabulate(n)(k => ((id + off + k) % 251).toByte)
            val comment = Array[Byte](0x21, 0xfe.toByte) ++ sub(l1, 0) ++ Array[Byte](0)
            val app = Array[Byte](0x21, 0xff.toByte) ++
              sub(11, 7) ++ sub(l2, 13) ++ Array[Byte](0)
            val at = 13 + 3 * (1 << ((base(10) & 7) + 1)) // after header+LSD+GCT
            val withMeta = base.take(at) ++ comment ++ app ++ base.drop(at)
            val (stripped, nBlocks) = Multimodal.GifCodec.stripMetadata(withMeta)
            val (dw, dh, px) = Multimodal.GifCodec.decode(stripped)
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (id, (withMeta.length - stripped.length).toLong, nBlocks.toLong,
              dw, dh, sum)
          }
        }(enc).toDF("media_id", "n_stripped_bytes", "n_blocks_stripped",
          "width", "height", "sum_gray")
    }),
    // the PNG parity of mm_jpeg_strip_meta: inject tEXt + eXIf
    // chunks (valid CRCs, id-derived lengths) after IHDR, strip, and
    // prove metadata gone + pixels untouched in one arithmetic oracle
    "mm_png_strip_meta" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.product[
        (Long, Long, Long, Int, Int, Long)]
      graft.operators.Spread.rebalanced(
        media(s, d).filter(col("kind") === "image").select("media_id"))
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0)
            val w = 16 + (id % 24).toInt
            val h = 10 + (id % 15).toInt
            val base = Multimodal.ImageHeader.encodePngStored(w, h,
              (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
            def chunk(tag: String, n: Int): Array[Byte] = {
              val a = new Array[Byte](12 + n)
              a(0) = (n >> 24).toByte; a(1) = (n >> 16).toByte
              a(2) = (n >> 8).toByte; a(3) = n.toByte
              tag.getBytes("US-ASCII").copyToArray(a, 4)
              var i = 0
              while (i < n) { a(8 + i) = ((id + i * 7) % 251).toByte; i += 1 }
              val crc = new java.util.zip.CRC32
              crc.update(a, 4, 4 + n)
              val c = crc.getValue
              a(8 + n) = (c >> 24).toByte; a(9 + n) = (c >> 16).toByte
              a(10 + n) = (c >> 8).toByte; a(11 + n) = c.toByte
              a
            }
            val l1 = 32 + (id % 64).toInt
            val l2 = 24 + (id % 48).toInt
            // IHDR chunk = 25 bytes after the 8-byte signature
            val withMeta = base.take(33) ++ chunk("tEXt", l1) ++
              chunk("eXIf", l2) ++ base.drop(33)
            val (stripped, nChunks) = Multimodal.PngCodec.stripMetadata(withMeta)
            val (dw, dh, px) = Multimodal.PngCodec.decode(stripped)
            var sum = 0L; var i = 0
            while (i < px.length) { sum += px(i) & 0xff; i += 1 }
            (id, (withMeta.length - stripped.length).toLong, nChunks.toLong,
              dw, dh, sum)
          }
        }(enc).toDF("media_id", "n_stripped_bytes", "n_chunks_stripped",
          "width", "height", "sum_gray")
    }),
    // cross-CONTAINER audio dedup: consecutive audio ids share a PCM
    // seed (id/6) but alternate container (id/3 mod 2: WAV / FLAC —
    // the lossless pair), so each pair decodes to identical samples
    // through two different real codecs and MUST collide in the
    // energy-contour fingerprint; the oracle replays the integer
    // window-energy gradient from the sample formula
    "mm_audio_dedup_fp" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val wavs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "audio") {
                val seed = id / 6
                val n = 1600 + (seed % 1600).toInt
                // amplitude envelope = per-window seed bit (1x or 2x):
                // the energy CONTOUR then encodes ~n/128 seed bits, so
                // distinct recordings get distinct fingerprints while
                // the WAV/FLAC pair still collides exactly
                val pcm = Array.tabulate(n) { k =>
                  val base = ((seed * 31 + k * 7) % 4096).toInt - 2048
                  base * (1 + ((seed >> ((k / 64) % 8)) & 1L).toInt)
                }
                if ((id / 3) % 2 == 0) Multimodal.WavCodec.encodePcm16(16000, pcm)
                else graft.sources.Flac.encode(pcm, blockSize = 512)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.audioFingerprint(wavs, windowSamples = 128, hopSamples = 64)
    }),
    // the fourth real-pixels decoder: 24-bit BI_RGB BMP, same dims
    // and formula as the GIF/PNG legs, same shared oracle
    "mm_bmp_pixels" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val bmps = media(s, d).select("media_id", "kind", "bytes")
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                Multimodal.ImageHeader.encodeBmp(w, h,
                  (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imagePixelStats(bmps)
    }),
    // the thumbnail op over the full lossless decoder family: each
    // image id rotates container (GIF / PNG / BMP by id/3 mod 3),
    // decodes through its real codec, and box-mean resizes to 9x7;
    // the oracle replays the integer grid arithmetic cell by cell
    "mm_image_resize" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                def pix(x: Int, y: Int) =
                  ((id * 31 + x * 7 + y * 13) % 256).toInt
                ((id / 3) % 3) match {
                  case 0 => Multimodal.ImageHeader.encodeGif(w, h, pix)
                  case 1 => Multimodal.ImageHeader.encodePngStored(w, h, pix)
                  case _ => Multimodal.ImageHeader.encodeBmp(w, h, pix)
                }
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imageResizeStats(imgs, outW = 9, outH = 7)
    }),
    // container NORMALIZATION across the full decoder family: image
    // ids rotate GIF / PNG / BMP / DC-only JPEG (id/3 mod 4), each
    // decodes through its real codec and re-encodes as canonical
    // stored-block RGB PNG; the emitted stats come from RE-DECODING
    // the transcoded bytes, so they only match the source formula if
    // every pixel survived the decode -> encode -> decode chain, and
    // out_len is exact stored-framing arithmetic (68 + h*(3w+1) at
    // these dims)
    "mm_image_transcode" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                def bv(bx: Int, by: Int) =
                  ((id * 31 + bx * 7 + by * 13) % 256).toInt
                def pix(x: Int, y: Int) =
                  ((id * 31 + x * 7 + y * 13) % 256).toInt
                ((id / 3) % 4) match {
                  case 0 => Multimodal.ImageHeader.encodeGif(w, h, pix)
                  case 1 => Multimodal.ImageHeader.encodePngStored(w, h, pix)
                  case 2 => Multimodal.ImageHeader.encodeBmp(w, h, pix)
                  case _ => graft.operators.JpegCodec.encodeJpegDcOnly(w, h, bv)
                }
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imageTranscodeStats(imgs)
    }),
    // EXIF privacy flags through the REAL TIFF/IFD parser: image ids
    // rotate carrier (JPEG APP1 / PNG eXIf chunk by id/3) and byte
    // order (II/MM by id parity); Make/Model/Orientation and — for
    // 2/3 of the rows — a GPS sub-IFD with DMS rationals all derive
    // from the id, so the oracle replays every flag (including the
    // signed milli-arc-second composition) arithmetically. This is
    // the DETECTION side of the strip trio: which media carry GPS
    // fixes before the pipeline decides to scrub or drop
    "mm_exif_flags" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = media(s, d).select("media_id", "kind", "bytes")
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                val gps =
                  if (id % 9 < 6)
                    Some(graft.operators.Exif.GpsDms(
                      if ((id / 9) % 2 == 0) 'N' else 'S',
                      (id % 90).toInt, (id % 60).toInt, ((id * 7) % 60).toInt,
                      if ((id / 18) % 2 == 0) 'E' else 'W',
                      ((id * 3) % 180).toInt, ((id * 5) % 60).toInt,
                      ((id * 11) % 60).toInt))
                  else None
                val tiff = graft.operators.Exif.encodeTiff(
                  littleEndian = id % 2 == 0,
                  orientation = 1 + (id % 8).toInt,
                  make = "Cam" + (id % 10), model = "Mod" + (id % 100), gps)
                if ((id / 3) % 2 == 0) {
                  val base = graft.operators.JpegCodec.encodeJpegDcOnly(w, h,
                    (bx, by) => ((id * 31 + bx * 7 + by * 13) % 256).toInt)
                  base.take(2) ++ graft.operators.Exif.encodeJpegApp1(tiff) ++
                    base.drop(2)
                } else {
                  val base = Multimodal.ImageHeader.encodePngStored(w, h,
                    (x, y) => ((id * 31 + x * 7 + y * 13) % 256).toInt)
                  // after the 8-byte signature + 25-byte IHDR chunk
                  base.take(33) ++ graft.operators.Exif.encodePngExifChunk(tiff) ++
                    base.drop(33)
                }
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      graft.operators.Exif.exifFlags(imgs)
    }),
    // animated-GIF frame sampling: image ids become multi-frame GIFs
    // (2 + id%4 frames, each a sub-rectangle at (f, f%3) with its own
    // pixel formula and a GCE delay), the full LZW machinery decodes
    // every frame independently, and the oracle replays placement,
    // timing, and pixel stats per frame
    "mm_gif_frames" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val gifs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                val nf = 2 + (id % 4).toInt
                val frames = (0 until nf).map { f =>
                  (f, f % 3, w - f, h - f % 3,
                    (x: Int, y: Int) =>
                      ((id * 31 + f * 97 + x * 7 + y * 13) % 256).toInt)
                }
                val delays = (0 until nf).map(f => 10 * (f + 1) + (id % 7).toInt)
                Multimodal.ImageHeader.encodeGifAnimated(w, h, frames, delays)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.gifFrameStats(gifs)
    }),
    // scene segmentation over real animated GIFs: scenes change every
    // 2 frames (s = t/2 in the content formula, +3 wiggle on odd
    // frames keeps within-scene pairs near-identical but nonzero);
    // within-scene mean |diff| = 3 < 16, across scenes >= 94 (the
    // mod-240 step of s*97 lands at |97| or |143| per pixel) -> cuts
    // exactly at odd->even transitions; oracle replays every pixel diff
    "mm_gif_scene_cuts" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val gifs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 20 + (id % 17).toInt
                val h = 14 + (id % 11).toInt
                val nf = 3 + (id % 4).toInt
                val frames = (0 until nf).map { t =>
                  (0, 0, w, h,
                    (x: Int, y: Int) =>
                      (((id * 31 + (t / 2) * 97 + (x / 4) * 7 +
                        (y / 4) * 13) % 240) + (t % 2) * 3).toInt)
                }
                val delays = (0 until nf).map(_ => 5)
                Multimodal.ImageHeader.encodeGifAnimated(w, h, frames, delays)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.gifSceneCuts(gifs)
    }),
    // the sampling step scene detection exists for: ONE representative
    // (first frame) per scene over the same planted animation — the
    // oracle re-derives the cut sequence, prefix-sums it into scene
    // ids, and pins value+place of every sampled pixel
    "mm_gif_scene_reps" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val gifs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 20 + (id % 17).toInt
                val h = 14 + (id % 11).toInt
                val nf = 3 + (id % 4).toInt
                val frames = (0 until nf).map { t =>
                  (0, 0, w, h,
                    (x: Int, y: Int) =>
                      (((id * 31 + (t / 2) * 97 + (x / 4) * 7 +
                        (y / 4) * 13) % 240) + (t % 2) * 3).toInt)
                }
                val delays = (0 until nf).map(_ => 5)
                Multimodal.ImageHeader.encodeGifAnimated(w, h, frames, delays)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.gifSceneReps(gifs)
    }),
    // safety-filter slot: the public Peer/Kovac RGB rule counted
    // exactly over real COLOR pixels through both full-color carriers
    // (stored-RGB PNG / 24-bit BMP by id/3 parity); per-channel block
    // formulas differ so every rule clause is load-bearing; oracle
    // replays rule, floor-ppm, and the strict flag threshold
    "mm_image_skin_ratio" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                def rgb(x: Int, y: Int): Int = {
                  val bx = x / 4; val by = y / 4
                  val rr = ((id * 31 + bx * 7 + by * 13) % 256).toInt
                  val gg = ((id * 17 + bx * 11 + by * 5) % 256).toInt
                  val bb = ((id * 23 + bx * 3 + by * 19) % 256).toInt
                  (rr << 16) | (gg << 8) | bb
                }
                if ((id / 3) % 2 == 0)
                  Multimodal.PngCodec.encodeRgb(w, h,
                    Array.tabulate(w * h)(k => rgb(k % w, k / w)))
                else Multimodal.ImageHeader.encodeBmpRgb(w, h, rgb)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imageSkinRatio(imgs)
    }),
    // aspect normalization: rotate the lossless containers, center
    // each decoded image on its max(w,h) square, and pin value+place
    // of every canvas cell with the position-weighted checksum; the
    // oracle replays the integer placement arithmetic
    "mm_image_letterbox" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                def pix(x: Int, y: Int) =
                  ((id * 31 + x * 7 + y * 13) % 256).toInt
                ((id / 3) % 3) match {
                  case 0 => Multimodal.ImageHeader.encodeGif(w, h, pix)
                  case 1 => Multimodal.ImageHeader.encodePngStored(w, h, pix)
                  case _ => Multimodal.ImageHeader.encodeBmp(w, h, pix)
                }
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.imageLetterboxStats(imgs)
    }),
    // silence trim: audio ids carry WAV/FLAC whose PCM is zeros for
    // id%4 leading and id%3 trailing 100-sample windows around a loud
    // formula middle (plus a partial tail that rides along only when
    // no trailing window is cut — the boundary the contract defines);
    // the oracle replays the kept range and its stats arithmetically
    "mm_audio_trim" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val auds = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "audio") {
                val leadW = (id % 4).toInt; val midW = 5 + (id % 6).toInt
                val tailW = (id % 3).toInt; val part = (id % 100).toInt
                val nIn = (leadW + midW + tailW) * 100 + part
                val pcm = Array.tabulate(nIn) { k =>
                  val inMiddle = k >= leadW * 100 && k < (leadW + midW) * 100
                  val inPartial = k >= (leadW + midW + tailW) * 100
                  if (inMiddle || inPartial)
                    ((id * 7 + k * 13) % 4000).toInt - 2000
                  else 0
                }
                if ((id / 3) % 2 == 0) Multimodal.WavCodec.encodePcm16(16000, pcm)
                else graft.sources.Flac.encode(pcm, blockSize = 256)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.audioTrimSilenceStats(auds, windowSamples = 100,
        energyThreshold = 0L)
    }),
    // orientation normalization: image ids carry DC-only JPEGs whose
    // EXIF orientation tag is 1 + id%8 (all eight dihedral cases),
    // the operator parses the tag, decodes, applies the exact
    // coordinate permutation, and the position-weighted checksum
    // pins value AND place of every transformed pixel — the oracle
    // replays the permutation per orientation case in SQL
    "mm_exif_orient" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val imgs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 16 + (id % 24).toInt
                val h = 10 + (id % 15).toInt
                val tiff = graft.operators.Exif.encodeTiff(
                  littleEndian = id % 2 == 0,
                  orientation = 1 + (id % 8).toInt,
                  make = "C", model = "M", gps = None)
                val base = graft.operators.JpegCodec.encodeJpegDcOnly(w, h,
                  (bx, by) => ((id * 31 + bx * 7 + by * 13) % 256).toInt)
                base.take(2) ++ graft.operators.Exif.encodeJpegApp1(tiff) ++
                  base.drop(2)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.exifOrientNormalize(imgs)
    }),
    // channel normalization: audio ids alternate stereo (interleaved
    // L/R from two id-derived formulas) and mono WAV; the operator
    // mixes to mono by truncating frame means and the oracle replays
    // the per-frame (L+R)/2 arithmetic on the signed samples
    "mm_audio_mixdown" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val auds = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "audio") {
                val n = 800 + (id % 800).toInt
                if ((id / 3) % 2 == 0) {
                  val l = Array.tabulate(n)(k =>
                    ((id * 13 + k * 7) % 4096).toInt - 2048)
                  val rr = Array.tabulate(n)(k =>
                    ((id * 29 + k * 3) % 4096).toInt - 2048)
                  Multimodal.WavCodec.encodePcm16Stereo(16000, l, rr)
                } else
                  Multimodal.WavCodec.encodePcm16(16000, Array.tabulate(n)(k =>
                    ((id * 13 + k * 7) % 4096).toInt - 2048))
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.audioMixdownStats(auds)
    }),
    // rate normalization over both lossless audio containers: audio
    // ids alternate WAV / FLAC (id/3 parity), decode through their
    // real codecs, and decimate 4x by non-overlapping TRUNCATING
    // means (toward zero — Java /, Spark div, and DuckDB integer //
    // all agree; measured here first: floored means diverged on the
    // signed sums, so the trunc-vs-floor distinction is LIVE in this
    // fixture, not just documented)
    "mm_audio_resample" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val auds = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "audio") {
                val n = 1200 + (id % 1200).toInt
                val pcm = Array.tabulate(n)(k =>
                  ((id * 23 + k * 11) % 4096).toInt - 2048)
                if ((id / 3) % 2 == 0) Multimodal.WavCodec.encodePcm16(16000, pcm)
                else graft.sources.Flac.encode(pcm, blockSize = 512)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.audioResampleStats(auds, factor = 4)
    }),
    // loudness normalization over both lossless containers (WAV/FLAC
    // by id/3 parity): peak-to-full-scale integer gain in Q15, outputs
    // by TRUNCATING division — the oracle replays gain derivation and
    // every normalized sample from the PCM formula
    "mm_audio_normalize" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val auds = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "audio") {
                val n = 800 + (id % 900).toInt
                val pcm = Array.tabulate(n)(k =>
                  ((id * 29 + k * 17) % 4096).toInt - 2048)
                if ((id / 3) % 2 == 0) Multimodal.WavCodec.encodePcm16(16000, pcm)
                else graft.sources.Flac.encode(pcm, blockSize = 512)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.audioNormalizeStats(auds)
    }),
    "mm_wav_segments" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val wavs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "audio") {
                val n = 300 + (id % 450).toInt
                Multimodal.WavCodec.encodePcm16(16000,
                  Array.tabulate(n)(k => ((id * 31 + k * 7) % 4096).toInt - 2048))
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.wavSegmentStats(wavs, windowSamples = 400, hopSamples = 160)
    }),
    // COMPRESSED audio decode: audio rows carry real FLAC payloads
    // (from-scratch lossless codec, sources/Flac.scala) whose PCM
    // derives from the id; the operator decodes the compressed stream
    // and windows it, and — because the codec is lossless — the oracle
    // recomputes every stat from the same sample formula, proving the
    // full encode->decode->analyze pipeline exact
    "mm_flac_segments" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val flacs = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "audio") {
                val n = 500 + (id % 700).toInt
                graft.sources.Flac.encode(
                  Array.tabulate(n)(k => ((id * 17 + k * 13) % 8192).toInt - 4096),
                  blockSize = 256)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.flacSegmentStats(flacs, windowSamples = 512, hopSamples = 256)
    }),
    // real CONTAINER metadata for video: video-kind rows become actual
    // ISO BMFF files (box tree encoded by Mp4Codec, movie/track facts
    // derived from the id) and the operator re-extracts every fact by
    // a real box-tree parse; image/audio/text payloads exercise the
    // not-an-MP4 skip path. Sample decode stays behind the documented
    // stub — container structure is the real, uncompressed part
    // MJPEG-in-AVI: video crosses from container math to REAL PIXELS
    // with an exact oracle (VERDICT r16 item 4) — image ids become
    // AVIs of DC-only baseline JPEG frames (dims multiples of 8, so
    // every 8x8 block holds exactly 64 pixels and the per-frame stats
    // replay as 64x block-formula sums); the strict RIFF walk + idx1
    // cross-check + entropy decode all run for real
    "mm_avi_frames" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val avis = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 8 * (2 + (id % 4).toInt)
                val h = 8 * (2 + (id % 3).toInt)
                val nf = 2 + (id % 4).toInt
                val frames = (0 until nf).map { t =>
                  graft.operators.JpegCodec.encodeJpegDcOnly(w, h,
                    (bx, by) => ((id * 31 + t * 97 + bx * 7 + by * 13) % 256).toInt)
                }
                graft.sources.Avi.encodeMjpeg(w, h,
                  33000 + (id % 7).toInt * 1000, frames)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.aviFrameStats(avis)
    }),
    // scene segmentation over real MJPEG video — the X210 composition
    // on the AVI path: scenes change every 2 frames (+3 wiggle on odd
    // frames keeps within-scene diffs at mean 3 < 16), cuts exactly
    // at odd->even transitions; block-constant frames keep the JPEG
    // decode exact so the oracle replays every block diff
    "mm_avi_scene_cuts" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val avis = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 8 * (2 + (id % 3).toInt)
                val h = 8 * (2 + (id % 2).toInt)
                val nf = 3 + (id % 4).toInt
                val frames = (0 until nf).map { t =>
                  graft.operators.JpegCodec.encodeJpegDcOnly(w, h,
                    (bx, by) => (((id * 31 + (t / 2) * 97 + bx * 7 +
                      by * 13) % 240) + (t % 2) * 3).toInt)
                }
                graft.sources.Avi.encodeMjpeg(w, h, 33000, frames)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.aviSceneCuts(avis)
    }),
    // one representative per scene over the same planted MJPEG
    // animation — completes the X210 trio on the real video path; the
    // oracle re-derives cuts, prefix-sums scene ids, and pins value
    // AND place of every rep pixel via the block position-weight sum
    "mm_avi_scene_reps" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val avis = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "image") {
                val w = 8 * (2 + (id % 3).toInt)
                val h = 8 * (2 + (id % 2).toInt)
                val nf = 3 + (id % 4).toInt
                val frames = (0 until nf).map { t =>
                  graft.operators.JpegCodec.encodeJpegDcOnly(w, h,
                    (bx, by) => (((id * 31 + (t / 2) * 97 + bx * 7 +
                      by * 13) % 240) + (t % 2) * 3).toInt)
                }
                graft.sources.Avi.encodeMjpeg(w, h, 33000, frames)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.aviSceneReps(avis)
    }),
    // video-level perceptual near-dup (VERDICT r17 item 4) — closes
    // the multimodal dedup matrix (text/image/audio/video). Fixture:
    // image-kind rows become 72x64 MJPEG AVIs (block-aligned dims, so
    // the 9x8 dHash cells ARE the DC blocks and the oracle replays
    // every hash bit from the block formula) in groups of four
    // consecutive image rows: role 0 base, role 1 TRIMMED copy (first
    // scene dropped + different frame rate), role 2 RE-ENCODED copy
    // (+4 global brightness — dHash is exactly invariant, bytes are
    // not), role 3 a distinct video (gradient family reseeded).
    // Trim and re-encode must pair with the base; the pair search is
    // the banded-Hamming core with its guard
    "mm_video_neardup" -> ((s, d) =>
      Multimodal.videoNearDupPairs(videoDedupFixture(s, d))),
    // the signature surface itself as an oracle row: one dHash per
    // detected scene rep, every hash bit replayed from the planted
    // block formula (72x64 makes the 9x8 dHash cells == DC blocks)
    "mm_video_signature" -> ((s, d) =>
      Multimodal.videoSignature(videoDedupFixture(s, d))),
    // modal scene-index offset per near-dup pair — the trim-vs-
    // re-encode adjudication signal: re-encodes align at 0 across all
    // scenes, a head-trim aligns at one negative offset
    "mm_video_align" -> ((s, d) =>
      Multimodal.videoAlignOffsets(videoDedupFixture(s, d))),
    // the one-pass production form: decode + banded join run ONCE,
    // both reduces (pair strength + modal offset) derived from the
    // cut scene-pair frame and joined onto one decision row
    "mm_video_adjudicated" -> ((s, d) =>
      Multimodal.videoNearDupAdjudicated(videoDedupFixture(s, d))),
    "mm_mp4_meta" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val mp4s = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "video") {
                val durTicks = 600L * (3 + id % 57) + id % 600
                val video = Multimodal.Mp4Codec.TrackInfo(1L, "vide", 600L,
                  durTicks, 320 + (id % 8).toInt * 80, 240 + (id % 6).toInt * 60)
                val tracks =
                  if (id % 2 == 0)
                    Seq(video, Multimodal.Mp4Codec.TrackInfo(
                      2L, "soun", 16000L, durTicks * 16000L / 600L, 0, 0))
                  else Seq(video)
                Multimodal.Mp4Codec.encode(600L, durTicks, tracks,
                  Array.tabulate(8)(k => ((id + k) % 251).toByte))
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.mp4Meta(mp4s)
    }),
    // frame extraction WITHOUT decode: video ids become MP4s with
    // REAL sample tables (stsz/stsc/stco/stss/stts; 3-samples/chunk
    // with a remainder stsc run, keyframe every 5th, id-derived
    // sizes/delta) and the operator re-derives every sample's byte
    // range, decode time, and keyframe flag from container math
    // alone; the oracle replays the arithmetic (offset = exclusive
    // size prefix within the mdat)
    "mm_mp4_sample_ranges" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val mp4s = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "video") {
                val n = 8 + (id % 20).toInt
                val delta = 256 + (id % 100)
                val samples = Array.tabulate(n) { i =>
                  val sz = 20 + ((id * 7 + i * 13) % 40).toInt
                  Array.tabulate(sz)(k => ((id + i * 31 + k) % 251).toByte)
                }
                Multimodal.Mp4Codec.encodeWithSamples(600L,
                  Multimodal.Mp4Codec.TrackInfo(1L, "vide", 600L,
                    n * delta, 320, 240),
                  samples, samplesPerChunk = 3, delta = delta, syncEvery = 5)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
      Multimodal.mp4SampleRanges(mp4s)
    }),
    // bitrate timeline over the same real container: samples bucket by
    // dts div 1024; oracle replays sizes/dts/keyframes from the
    // formulas and the same bucketing
    "mm_mp4_bitrate" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.BINARY)
      val mp4s = mediaSpread(s, d)
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0); val kind = r.getString(1)
            val payload =
              if (kind == "video") {
                val n = 8 + (id % 20).toInt
                val delta = 256 + (id % 100)
                val samples = Array.tabulate(n) { i =>
                  val sz = 20 + ((id * 7 + i * 13) % 40).toInt
                  Array.tabulate(sz)(k => ((id + i * 31 + k) % 251).toByte)
                }
                Multimodal.Mp4Codec.encodeWithSamples(600L,
                  Multimodal.Mp4Codec.TrackInfo(1L, "vide", 600L,
                    n * delta, 320, 240),
                  samples, samplesPerChunk = 3, delta = delta, syncEvery = 5)
              } else r.getAs[Array[Byte]](2)
            (id, kind, payload)
          }
        }(enc).toDF("media_id", "kind", "bytes")
        .filter(col("kind") === "video")
      Multimodal.mp4BitrateTimeline(mp4s, windowTicks = 1024L)
    }),
    // keyframe payloads pulled by container math alone: same fixture
    // as mm_mp4_sample_ranges (byte k of sample i = (id + i*31 + k) %
    // 251, keyframe every 5th), so first/last byte and the position-
    // weighted checksum of every extracted slice replay arithmetically
    "mm_mp4_keyframes" -> ((s, d) => {
      val enc = org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaLong,
        org.apache.spark.sql.Encoders.BINARY)
      val mp4s = graft.operators.Spread.rebalanced(
        media(s, d).filter(col("kind") === "video").select("media_id"))
        .mapPartitions { it: Iterator[org.apache.spark.sql.Row] =>
          it.map { r =>
            val id = r.getLong(0)
            val n = 8 + (id % 20).toInt
            val delta = 256 + (id % 100)
            val samples = Array.tabulate(n) { i =>
              val sz = 20 + ((id * 7 + i * 13) % 40).toInt
              Array.tabulate(sz)(k => ((id + i * 31 + k) % 251).toByte)
            }
            (id, Multimodal.Mp4Codec.encodeWithSamples(600L,
              Multimodal.Mp4Codec.TrackInfo(1L, "vide", 600L,
                n * delta, 320, 240),
              samples, samplesPerChunk = 3, delta = delta, syncEvery = 5))
          }
        }(enc).toDF("media_id", "bytes")
      Multimodal.mp4KeyframePayloads(mp4s)
    }),
    "mm_resize_cksum" -> ((s, d) => {
      val r = Multimodal.resize(media(s, d), targetCells = 64)
        .withColumn("rs", col("resized_bytes").cast("string"))
      r.select(col("media_id"),
        length(col("resized_bytes")).cast("long").as("n_out"),
        aggregate(filter(split(col("rs"), ""), c => c =!= ""),
          lit(0L), (acc, c) => pmod(acc * 31 + ascii(c), lit(1000000007L)))
          .as("cksum"))
    }))

  private val kindSql =
    "CASE WHEN doc_id % 3 = 0 THEN 'image' WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END"

  /** (h*31 + byte) % 1e9+7 fold over the chars of a string expr. */
  private def foldCksum(sExpr: String): String =
    s"""list_reduce(list_prepend(0::BIGINT,
       list_transform(list_filter(string_split($sExpr, ''), c -> c != ''),
         c -> ord(c)::BIGINT)),
       (acc, c) -> (acc * 31 + c) % 1000000007)"""

  // stored-PNG payload arithmetic for image-kind rows (doc_id % 3 = 0):
  // w = 8 + id % 57, h = 8 + id*3 % 57, total = 68 + h*(w+1)
  private val imgW = "(8 + doc_id % 57)"
  private val imgH = "(8 + (doc_id * 3) % 57)"
  private val imgLen = s"(68 + $imgH * ($imgW + 1))"

  /** Shared by mm_gif_pixels and mm_png_pixels — same dims, same
    * pixel formula, two real decoders. */
  private def pixelStatsOracleSql: String =
    s"""WITH g AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
           10 + doc_id % 15 AS h
         FROM documents WHERE doc_id % 3 = 0),
       px AS (SELECT media_id, w, h,
           ((media_id * 31 + x.x * 7 + y.y * 13) % 256) AS v
         FROM g, LATERAL unnest(range(0, w)) AS x(x),
           LATERAL unnest(range(0, h)) AS y(y))
       SELECT media_id, w AS width, h AS height,
         count(*) AS n_pixels, CAST(sum(v) AS BIGINT) AS sum_gray,
         min(v) AS min_gray, max(v) AS max_gray
       FROM px GROUP BY 1, 2, 3"""

  /** The Q14 DCT basis interpolated verbatim from the Scala table —
    * the single source of truth (no cos() runs in DuckDB, so 1-ulp
    * trig differences between engines cannot exist). */
  private val dctValues: String =
    (for (u <- 0 until 8; x <- 0 until 32)
      yield s"($u, $x, ${graft.operators.Multimodal.dctCosQ14(u)(x)})")
      .mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "mm_decode_meta" ->
      s"""SELECT doc_id AS media_id, $kindSql AS kind,
           (CASE WHEN doc_id % 3 = 0 THEN $imgLen
                 ELSE length(text) END)::BIGINT AS n_bytes,
           (CASE WHEN doc_id % 3 = 0 THEN $imgW
                 ELSE 64 + length(text) % 512 END)::INT AS width,
           (CASE WHEN doc_id % 3 = 0 THEN $imgH
                 ELSE 64 + (length(text)::BIGINT * 31) % 512 END)::INT AS height,
           (1 + (CASE WHEN doc_id % 3 = 0 THEN $imgLen
                      ELSE length(text) END) % 30)::INT AS n_frames,
           (CASE WHEN doc_id % 3 = 1 THEN 16000
                 WHEN doc_id % 3 = 2 THEN 30 ELSE 0 END)::INT AS sample_rate
         FROM documents""",
    // MJPEG-in-AVI frame stats: dims are multiples of 8 and frames
    // are block-constant DC-only JPEGs, so the decoded gray plane is
    // the block formula exactly — per-frame sums replay as 64x the
    // per-block sum, min/max over block values
    "mm_avi_frames" ->
      s"""WITH g AS (SELECT doc_id AS media_id,
             8 * (2 + doc_id % 4) AS w, 8 * (2 + doc_id % 3) AS h,
             2 + doc_id % 4 AS nf,
             33000 + (doc_id % 7) * 1000 AS upf
           FROM documents WHERE doc_id % 3 = 0),
         bx AS (SELECT media_id, w, h, nf, upf, f.f AS f,
             ((media_id * 31 + f.f * 97 + x.x * 7 + y.y * 13) % 256) AS v
           FROM g, LATERAL unnest(range(0, nf)) AS f(f),
             LATERAL unnest(range(0, w // 8)) AS x(x),
             LATERAL unnest(range(0, h // 8)) AS y(y))
         SELECT media_id, f::BIGINT AS frame_idx, w::BIGINT AS width,
           h::BIGINT AS height, upf::BIGINT AS us_per_frame,
           CAST(sum(v) * 64 AS BIGINT) AS sum_gray,
           CAST(min(v) AS BIGINT) AS min_gray,
           CAST(max(v) AS BIGINT) AS max_gray
         FROM bx GROUP BY media_id, f, w, h, upf""",
    // adjacent-frame |diff| replay on block coordinates (per-pixel
    // diff == per-block diff, 64 pixels per block); cut strictly
    // above 16, scenes = 1 + cuts — the mm_gif_scene_cuts contract on
    // the real video path
    "mm_avi_scene_cuts" ->
      s"""WITH g AS (SELECT doc_id AS media_id,
             8 * (2 + doc_id % 3) AS w, 8 * (2 + doc_id % 2) AS h,
             3 + doc_id % 4 AS nf
           FROM documents WHERE doc_id % 3 = 0),
         pr AS (SELECT media_id, w, h, t.t AS t
           FROM g, LATERAL unnest(range(1, nf)) AS t(t)),
         d AS (SELECT media_id, w, h, t,
             abs((((media_id * 31 + (t // 2) * 97 + x.x * 7 +
                    y.y * 13) % 240) + (t % 2) * 3) -
                 (((media_id * 31 + ((t - 1) // 2) * 97 + x.x * 7 +
                    y.y * 13) % 240) + ((t - 1) % 2) * 3)) AS ad
           FROM pr, LATERAL unnest(range(0, w // 8)) AS x(x),
             LATERAL unnest(range(0, h // 8)) AS y(y)),
         p AS (SELECT media_id, t AS frame_idx,
             CAST(min(w) * min(h) AS BIGINT) AS n_px,
             CAST(sum(ad) * 64 AS BIGINT) AS sum_abs_diff,
             CAST(sum(ad) * 64 // (min(w) * min(h)) AS BIGINT) AS mean_diff
           FROM d GROUP BY media_id, t),
         c AS (SELECT *, (mean_diff > 16) AS is_cut FROM p)
         SELECT media_id, frame_idx::BIGINT AS frame_idx, n_px,
           sum_abs_diff, mean_diff, is_cut,
           CAST(1 + sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
             OVER (PARTITION BY media_id) AS BIGINT) AS n_scenes
         FROM c""",
    // cut sequence -> prefix-sum scene ids -> first frame per scene;
    // rep stats at block granularity: sum = 64x block sum, checksum =
    // sum over blocks of v * posSum(bx,by) where posSum (the exact
    // integer sum of (y*w + x + 1) over the block's 64 pixels) =
    // 8*w*(64*by + 28) + 512*bx + 288
    "mm_avi_scene_reps" ->
      s"""WITH g AS (SELECT doc_id AS media_id,
             8 * (2 + doc_id % 3) AS w, 8 * (2 + doc_id % 2) AS h,
             3 + doc_id % 4 AS nf
           FROM documents WHERE doc_id % 3 = 0),
         pr AS (SELECT media_id, w, h, t.t AS t
           FROM g, LATERAL unnest(range(1, nf)) AS t(t)),
         d AS (SELECT media_id, w, h, t,
             abs((((media_id * 31 + (t // 2) * 97 + x.x * 7 +
                    y.y * 13) % 240) + (t % 2) * 3) -
                 (((media_id * 31 + ((t - 1) // 2) * 97 + x.x * 7 +
                    y.y * 13) % 240) + ((t - 1) % 2) * 3)) AS ad
           FROM pr, LATERAL unnest(range(0, w // 8)) AS x(x),
             LATERAL unnest(range(0, h // 8)) AS y(y)),
         p AS (SELECT media_id, t,
             (sum(ad) * 64 // (min(w) * min(h))) AS mean_diff
           FROM d GROUP BY 1, 2),
         fr AS (SELECT media_id, w, h, t.t AS t
           FROM g, LATERAL unnest(range(0, nf)) AS t(t)),
         fc AS (SELECT fr.media_id, fr.w, fr.h, fr.t,
             CASE WHEN p.mean_diff > 16 THEN 1 ELSE 0 END AS cut
           FROM fr LEFT JOIN p
             ON p.media_id = fr.media_id AND p.t = fr.t),
         sc AS (SELECT *, sum(cut) OVER (PARTITION BY media_id
             ORDER BY t) AS scene FROM fc),
         agg AS (SELECT media_id, w, h, scene AS scene_idx,
             min(t) AS rep, count(*) AS n_frames
           FROM sc GROUP BY 1, 2, 3, 4),
         px AS (SELECT r.media_id, r.scene_idx, r.rep, r.n_frames,
             (8 * r.w * (64 * y.y + 28) + 512 * x.x + 288) AS wgt,
             (((r.media_id * 31 + (r.rep // 2) * 97 + x.x * 7 +
                y.y * 13) % 240) + (r.rep % 2) * 3) AS v
           FROM agg r, LATERAL unnest(range(0, r.w // 8)) AS x(x),
             LATERAL unnest(range(0, r.h // 8)) AS y(y))
         SELECT media_id, scene_idx::BIGINT AS scene_idx,
           rep::BIGINT AS rep_frame_idx, n_frames::BIGINT AS n_frames,
           CAST(sum(v) * 64 AS BIGINT) AS rep_sum_gray,
           CAST(sum(wgt * v) AS BIGINT) AS rep_checksum
         FROM px GROUP BY 1, 2, 3, 4""",
    // every stage replayed from the planted block formula: frames ->
    // block-granular diffs (block-constant: per-pixel mean = block
    // sum // 72) -> scene prefix sums -> rep = first frame -> dHash
    // bits straight off the blocks (72x64 makes cells == blocks) ->
    // the 4-band candidate join -> hamming <= 3 -> video-level reduce
    "mm_video_neardup" ->
      s"""WITH $videoSigCtes,
         $videoHamCtes
         SELECT id_a, id_b,
           CAST(least(count(DISTINCT scene_a), count(DISTINCT scene_b))
             AS BIGINT) AS n_shared_scenes
         FROM ham GROUP BY 1, 2
         HAVING least(count(DISTINCT scene_a), count(DISTINCT scene_b)) >= 2""",
    // modal scene-index offset per matched pair (the trim-vs-re-encode
    // adjudication signal); deterministic tie: (count desc, offset asc)
    "mm_video_align" ->
      s"""WITH $videoSigCtes,
         $videoHamCtes,
         po AS (SELECT id_a, id_b, scene_b - scene_a AS scene_offset,
             count(DISTINCT scene_a)::BIGINT AS n_aligned
           FROM ham GROUP BY 1, 2, 3),
         rk AS (SELECT *, row_number() OVER (PARTITION BY id_a, id_b
             ORDER BY n_aligned DESC, scene_offset ASC) AS rn FROM po)
         SELECT id_a, id_b, CAST(scene_offset AS BIGINT) AS scene_offset,
           n_aligned
         FROM rk WHERE rn = 1 AND n_aligned >= 2""",
    // the one-pass decision row: the two single-signal reduces above,
    // joined — same CTE chains, conjunction of both HAVING/rn filters
    "mm_video_adjudicated" ->
      s"""WITH $videoSigCtes,
         $videoHamCtes,
         nd AS (SELECT id_a, id_b,
             CAST(least(count(DISTINCT scene_a), count(DISTINCT scene_b))
               AS BIGINT) AS n_shared_scenes
           FROM ham GROUP BY 1, 2
           HAVING least(count(DISTINCT scene_a), count(DISTINCT scene_b)) >= 2),
         po AS (SELECT id_a, id_b, scene_b - scene_a AS scene_offset,
             count(DISTINCT scene_a)::BIGINT AS n_aligned
           FROM ham GROUP BY 1, 2, 3),
         rk AS (SELECT *, row_number() OVER (PARTITION BY id_a, id_b
             ORDER BY n_aligned DESC, scene_offset ASC) AS rn FROM po),
         al AS (SELECT id_a, id_b,
             CAST(scene_offset AS BIGINT) AS scene_offset, n_aligned
           FROM rk WHERE rn = 1 AND n_aligned >= 2)
         SELECT nd.id_a, nd.id_b, nd.n_shared_scenes,
           al.scene_offset, al.n_aligned
         FROM nd JOIN al ON nd.id_a = al.id_a AND nd.id_b = al.id_b""",
    "mm_video_signature" ->
      s"""WITH $videoSigCtes
         SELECT r.media_id, CAST(r.scene AS BIGINT) AS scene_idx,
           CAST(r.rep AS BIGINT) AS rep_frame_idx, h.dh AS rep_dhash
         FROM rep r JOIN hx h
           ON h.media_id = r.media_id AND h.scene = r.scene""",
    // every movie fact re-derived from the id arithmetic the fixture
    // encoder used; duration_ms is exact integer division on both sides
    "mm_mp4_meta" ->
      s"""WITH v AS (SELECT doc_id AS media_id,
             (600 * (3 + (doc_id % 57)) + (doc_id % 600)) AS dur_ticks
           FROM documents WHERE (doc_id % 3) = 2)
         SELECT media_id,
           CAST(600 AS BIGINT) AS timescale,
           ((dur_ticks * 1000) // 600) AS duration_ms,
           CAST(1 + (CASE WHEN (media_id % 2) = 0 THEN 1 ELSE 0 END) AS INT)
             AS n_tracks,
           CAST(320 + ((media_id % 8) * 80) AS INT) AS width,
           CAST(240 + ((media_id % 6) * 60) AS INT) AS height,
           ((media_id % 2) = 0) AS has_audio
         FROM v""",
    "mm_image_dims" ->
      s"""SELECT doc_id AS media_id,
           (8 + (doc_id * 7) % 64)::INT AS width,
           (8 + (doc_id * 13) % 64)::INT AS height
         FROM documents""",
    "mm_feature_cksum" ->
      s"""SELECT doc_id AS media_id, length(text)::BIGINT AS n_bytes,
           ${foldCksum("text")} AS checksum
         FROM documents""",
    // plane = every 7th byte (i*7 < len <=> i < ceil(len/7)), zero-
    // padded to dim 16 — FakeCodec.samplePlane on ASCII payloads
    "mm_features" ->
      s"""SELECT doc_id AS media_id, length(text)::BIGINT AS n_bytes,
           ${foldCksum("text")} AS checksum,
           array_to_string(list_transform(range(0, 16), i ->
             CASE WHEN i * 7 < length(text)
               THEN ord(substr(text, (i * 7 + 1)::INT, 1)) ELSE 0 END), ',')
             AS feature_csv
         FROM documents""",
    "mm_frame_sample" ->
      s"""SELECT doc_id AS media_id, f AS frame_idx,
           length(substr(text, f * 32 + 1, 32))::BIGINT AS frame_len,
           ord(substr(text, f * 32 + 1, 1))::BIGINT AS first_byte
         FROM documents,
           LATERAL unnest(range(0, greatest(length(text) // 32, 1), 4)) AS t(f)
         WHERE doc_id % 3 = 2""",
    "mm_audio_segments" ->
      s"""SELECT doc_id AS media_id, (o // 160)::BIGINT AS seg_idx,
           least(400, length(text) - o)::BIGINT AS seg_len,
           ord(substr(text, o + 1, 1))::BIGINT AS first_byte
         FROM documents,
           LATERAL unnest(range(0, length(text), 160)) AS t(o)
         WHERE doc_id % 3 = 1""",
    // WAV fixture arithmetic: n = 300 + id % 450 samples,
    // s_k = (id*31 + k*7) % 4096 - 2048; windows 400 / hop 160
    "mm_gif_pixels" -> pixelStatsOracleSql,
    "mm_png_pixels" -> pixelStatsOracleSql,
    "mm_bmp_pixels" -> pixelStatsOracleSql,
    // integer box-mean replay: cell (i,j) = source pixels with
    // i = x*9//w, j = y*7//h, mean = sum//count; checksum weights
    // each cell mean by its position so value AND place are pinned
    "mm_image_resize" ->
      s"""WITH dims AS (SELECT doc_id AS media_id,
             (16 + doc_id % 24) AS w, (10 + doc_id % 15) AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             (x.x * 9) // w AS i, (y.y * 7) // h AS j,
             ((media_id * 31 + x.x * 7 + y.y * 13) % 256) AS v
           FROM dims, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         cells AS (SELECT media_id, w, h, i, j, (sum(v) // count(*)) AS m
           FROM px GROUP BY 1, 2, 3, 4, 5)
         SELECT media_id, w::BIGINT AS width, h::BIGINT AS height,
           CAST(9 AS BIGINT) AS out_w, CAST(7 AS BIGINT) AS out_h,
           CAST(sum((j * 9 + i + 1) * m) AS BIGINT) AS checksum,
           CAST(min(m) AS BIGINT) AS min_cell,
           CAST(max(m) AS BIGINT) AS max_cell
         FROM cells GROUP BY 1, 2, 3""",
    // same dims as the GIF/PNG pair but the value is per 8x8 BLOCK:
    // DC-only JPEG decodes to blockVal(x//8, y//8) exactly in every
    // conforming decoder (all-zero AC + q0=8 -> both IDCT passes take
    // their integer DC shortcut)
    "mm_jpeg_pixels" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
             10 + doc_id % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             ((media_id * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM g, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y))
         SELECT media_id, w AS width, h AS height,
           count(*) AS n_pixels, CAST(sum(v) AS BIGINT) AS sum_gray,
           min(v) AS min_gray, max(v) AS max_gray
         FROM px GROUP BY 1, 2, 3""",
    // integer dHash replay: luma == v on gray pixels, 9x8 grid by
    // i = x*9//w / j = y*8//h, cell mean = sum//count, bit (j*8+i) =
    // cell(i,j) < cell(i+1,j), packed via two 32-bit halves into the
    // same 16-hex-char rendering the Spark side emits
    "mm_image_dedup_dhash" ->
      s"""WITH dims AS (SELECT doc_id AS media_id, doc_id // 9 AS seed,
             (16 + (doc_id // 9) % 24) AS w, (10 + (doc_id // 9) % 15) AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             (x.x * 9) // w AS i, (y.y * 8) // h AS j,
             ((seed * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM dims, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         cells AS (SELECT media_id, w, h, i, j,
             (sum(v) // count(*)) AS m
           FROM px GROUP BY 1, 2, 3, 4, 5),
         bits AS (SELECT a.media_id, a.w, a.h, (a.j * 8 + a.i) AS k,
             CASE WHEN a.m < b.m THEN 1 ELSE 0 END AS bit
           FROM cells a JOIN cells b
             ON b.media_id = a.media_id AND b.j = a.j AND b.i = a.i + 1
           WHERE a.i < 8),
         packed AS (SELECT media_id, w, h,
             CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k)
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1, 2, 3)
         SELECT media_id, w::INT AS width, h::INT AS height,
           printf('%08x%08x', hi, lo) AS dhash,
           count(*) OVER (PARTITION BY printf('%08x%08x', hi, lo))
             AS n_same_hash
         FROM packed""",
    // pHash replay: 32x32 box-mean grid, 2D DCT low corner via the
    // interpolated Q14 table, median = 32nd-smallest AC (row_number,
    // value-identical under ties), bit p=u*8+v at weight 2^(63-p)
    "mm_image_phash" ->
      s"""WITH dims AS (SELECT doc_id AS media_id, doc_id // 9 AS seed,
             (40 + (doc_id // 9) % 24) AS w, (36 + (doc_id // 9) % 15) AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             (x.x * 32) // w AS i, (y.y * 32) // h AS j,
             ((seed * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM dims, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         cells AS (SELECT media_id, i, j, (sum(v) // count(*)) AS m
           FROM px GROUP BY 1, 2, 3),
         t(u, x, c) AS (VALUES $dctValues),
         coef AS (SELECT c.media_id, tu.u AS u, tv.u AS v,
             CAST(sum(c.m * tu.c * tv.c) AS BIGINT) AS f
           FROM cells c JOIN t tu ON tu.x = c.i JOIN t tv ON tv.x = c.j
           GROUP BY 1, 2, 3),
         ac AS (SELECT media_id, u, v, f FROM coef WHERE u + v > 0),
         med AS (SELECT media_id, f AS median FROM (
             SELECT media_id, f, row_number() OVER (PARTITION BY media_id
               ORDER BY f, u, v) AS rn FROM ac) WHERE rn = 32),
         bits AS (SELECT ac.media_id, (ac.u * 8 + ac.v) AS p,
             CASE WHEN ac.f > med.median THEN 1 ELSE 0 END AS bit
           FROM ac JOIN med ON ac.media_id = med.media_id),
         packed AS (SELECT media_id,
             CAST(sum(CASE WHEN p <= 31 THEN bit * (1::BIGINT << (31 - p))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN p > 31 THEN bit * (1::BIGINT << (63 - p))
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1)
         SELECT d.media_id, d.w::INT AS width, d.h::INT AS height,
           printf('%08x%08x', p.hi, p.lo) AS phash, m.median,
           count(*) OVER (PARTITION BY printf('%08x%08x', p.hi, p.lo))
             AS n_same_hash
         FROM packed p
         JOIN dims d ON d.media_id = p.media_id
         JOIN med m ON m.media_id = p.media_id""",
    // BOTH pair members hash from the UPRIGHT formula — the oracle
    // matches only if the Spark-side dihedral normalization restored
    // the rotated member's pixels exactly
    "mm_orient_phash_dedup" ->
      s"""WITH ids AS (SELECT doc_id AS media_id, doc_id // 6 AS seed,
             ((doc_id // 3) % 2) AS m
           FROM documents WHERE doc_id % 3 = 0),
         dims AS (SELECT DISTINCT seed, 40 + 8 * (seed % 3) AS w,
             32 + 8 * (seed % 2) AS h FROM ids),
         px AS (SELECT seed, w, h,
             (x.x * 32) // w AS i, (y.y * 32) // h AS j,
             ((seed * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM dims, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         cells AS (SELECT seed, i, j, (sum(v) // count(*)) AS m2
           FROM px GROUP BY 1, 2, 3),
         t(u, x, c) AS (VALUES $dctValues),
         coef AS (SELECT c.seed, tu.u AS u, tv.u AS v,
             CAST(sum(c.m2 * tu.c * tv.c) AS BIGINT) AS f
           FROM cells c JOIN t tu ON tu.x = c.i JOIN t tv ON tv.x = c.j
           GROUP BY 1, 2, 3),
         ac AS (SELECT seed, u, v, f FROM coef WHERE u + v > 0),
         med AS (SELECT seed, f AS median FROM (
             SELECT seed, f, row_number() OVER (PARTITION BY seed
               ORDER BY f, u, v) AS rn FROM ac) WHERE rn = 32),
         bits AS (SELECT ac.seed, (ac.u * 8 + ac.v) AS p,
             CASE WHEN ac.f > med.median THEN 1 ELSE 0 END AS bit
           FROM ac JOIN med ON ac.seed = med.seed),
         packed AS (SELECT seed,
             CAST(sum(CASE WHEN p <= 31 THEN bit * (1::BIGINT << (31 - p))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN p > 31 THEN bit * (1::BIGINT << (63 - p))
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1)
         SELECT i.media_id,
           (CASE WHEN i.m = 0 THEN 1 ELSE 6 END)::INT AS orientation,
           d.w::BIGINT AS out_w, d.h::BIGINT AS out_h,
           printf('%08x%08x', p.hi, p.lo) AS phash,
           count(*) OVER (PARTITION BY printf('%08x%08x', p.hi, p.lo))
             AS n_same_hash
         FROM ids i JOIN dims d ON d.seed = i.seed
         JOIN packed p ON p.seed = i.seed""",
    // full per-member pHash replay (each member hashes its OWN pixel
    // variant), candidates = OR of 16-bit band equality, popcount cut
    "mm_image_neardup_phash" ->
      s"""WITH ids AS (SELECT doc_id AS media_id, doc_id // 6 AS seed,
             ((doc_id // 3) % 2) AS m
           FROM documents WHERE doc_id % 3 = 0),
         dims AS (SELECT media_id, seed, m, 40 + seed % 24 AS w,
             36 + seed % 15 AS h FROM ids),
         px AS (SELECT media_id, w, h,
             (x.x * 32) // w AS i, (y.y * 32) // h AS j,
             CASE WHEN m = 0 THEN
                 ((seed * 31 + (x.x // 4) * 7 + (y.y // 4) * 13) % 200)
               WHEN seed % 4 = 0 THEN
                 255 - ((seed * 31 + (x.x // 4) * 7 + (y.y // 4) * 13) % 200)
               ELSE
                 ((seed * 31 + (x.x // 4) * 7 + (y.y // 4) * 13) % 200)
                   + (CASE WHEN x.x < 12 AND y.y < 12 THEN 15 ELSE 0 END)
               END AS v
           FROM dims, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         cells AS (SELECT media_id, i, j, (sum(v) // count(*)) AS m2
           FROM px GROUP BY 1, 2, 3),
         t(u, x, c) AS (VALUES $dctValues),
         coef AS (SELECT c.media_id, tu.u AS u, tv.u AS v,
             CAST(sum(c.m2 * tu.c * tv.c) AS BIGINT) AS f
           FROM cells c JOIN t tu ON tu.x = c.i JOIN t tv ON tv.x = c.j
           GROUP BY 1, 2, 3),
         ac AS (SELECT media_id, u, v, f FROM coef WHERE u + v > 0),
         med AS (SELECT media_id, f AS median FROM (
             SELECT media_id, f, row_number() OVER (PARTITION BY media_id
               ORDER BY f, u, v) AS rn FROM ac) WHERE rn = 32),
         bits AS (SELECT ac.media_id, (ac.u * 8 + ac.v) AS p,
             CASE WHEN ac.f > med.median THEN 1 ELSE 0 END AS bit
           FROM ac JOIN med ON ac.media_id = med.media_id),
         packed AS (SELECT media_id,
             CAST(sum(CASE WHEN p <= 31 THEN bit * (1::BIGINT << (31 - p))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN p > 31 THEN bit * (1::BIGINT << (63 - p))
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1)
         SELECT a.media_id AS id_a, b.media_id AS id_b,
           (bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)))::BIGINT
             AS hamming
         FROM packed a JOIN packed b ON a.media_id < b.media_id
           AND ((a.hi >> 16) = (b.hi >> 16)
             OR (a.hi & 65535) = (b.hi & 65535)
             OR (a.lo >> 16) = (b.lo >> 16)
             OR (a.lo & 65535) = (b.lo & 65535))
         WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 16""",
    // crawl replay: the status formula picks the 200s, dims/content
    // come from the seed, the grid hash is the dhash oracle's CTE —
    // every pipeline stage recomputed in SQL
    "mm_warc_image_pipeline" ->
      s"""WITH img AS (SELECT doc_id AS media_id, doc_id // 9 AS seed,
             CASE ((doc_id // 3) % 3) WHEN 0 THEN 'image/gif'
                  WHEN 1 THEN 'image/png' ELSE 'image/jpeg' END AS container,
             16 + (doc_id // 9) % 24 AS w, 10 + (doc_id // 9) % 15 AS h
           FROM documents
           WHERE doc_id % 3 = 0 AND (doc_id * 31 + 7) % 5 < 3),
         px AS (SELECT media_id, w, h,
             (x.x * 9) // w AS i, (y.y * 8) // h AS j,
             ((seed * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM img, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         cells AS (SELECT media_id, w, h, i, j, (sum(v) // count(*)) AS m
           FROM px GROUP BY 1, 2, 3, 4, 5),
         bits AS (SELECT a.media_id, a.w, a.h, (a.j * 8 + a.i) AS k,
             CASE WHEN a.m < b.m THEN 1 ELSE 0 END AS bit
           FROM cells a JOIN cells b
             ON b.media_id = a.media_id AND b.j = a.j AND b.i = a.i + 1
           WHERE a.i < 8),
         packed AS (SELECT media_id, w, h,
             CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k)
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1, 2, 3)
         SELECT p.media_id, img.container, p.w::INT AS width,
           p.h::INT AS height,
           printf('%08x%08x', p.hi, p.lo) AS dhash,
           count(*) OVER (PARTITION BY printf('%08x%08x', p.hi, p.lo))
             AS n_same_hash
         FROM packed p JOIN img ON img.media_id = p.media_id""",
    // full replication of hash + bands + popcount verify: same grid
    // arithmetic as the dhash oracle with the member perturbation,
    // then the 4x16-bit band candidate join and bit_count(xor) in SQL
    "mm_image_neardup_dhash" ->
      s"""WITH m AS (SELECT doc_id AS media_id, doc_id // 6 AS seed,
             (doc_id // 3) % 2 AS member,
             16 + (doc_id // 6) % 24 AS w, 10 + (doc_id // 6) % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, (x.x * 9) // w AS i, (y.y * 8) // h AS j,
             CASE WHEN member = 0
                    THEN ((seed * 31 + x.x * 7 + y.y * 13) % 200)
                  WHEN seed % 4 = 0
                    THEN 255 - ((seed * 31 + x.x * 7 + y.y * 13) % 200)
                  ELSE ((seed * 31 + x.x * 7 + y.y * 13) % 200)
                    + (CASE WHEN x.x < 8 AND y.y < 8 THEN 16 ELSE 0 END)
             END AS v
           FROM m, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         cells AS (SELECT media_id, i, j, (sum(v) // count(*)) AS mn
           FROM px GROUP BY 1, 2, 3),
         bits AS (SELECT a.media_id, (a.j * 8 + a.i) AS k,
             CASE WHEN a.mn < b.mn THEN 1 ELSE 0 END AS bit
           FROM cells a JOIN cells b
             ON b.media_id = a.media_id AND b.j = a.j AND b.i = a.i + 1
           WHERE a.i < 8),
         packed AS (SELECT media_id,
             CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k)
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1),
         hx AS (SELECT media_id, hi, lo, printf('%08x%08x', hi, lo) AS dh
           FROM packed),
         cand AS (SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b,
             a.hi AS hi_a, a.lo AS lo_a, b.hi AS hi_b, b.lo AS lo_b
           FROM hx a JOIN hx b ON b.media_id > a.media_id AND (
             substr(a.dh, 1, 4) = substr(b.dh, 1, 4)
             OR substr(a.dh, 5, 4) = substr(b.dh, 5, 4)
             OR substr(a.dh, 9, 4) = substr(b.dh, 9, 4)
             OR substr(a.dh, 13, 4) = substr(b.dh, 13, 4)))
         SELECT id_a, id_b,
           (bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)))::BIGINT
             AS hamming
         FROM cand
         WHERE bit_count(xor(hi_a, hi_b)) + bit_count(xor(lo_a, lo_b)) <= 8""",
    // pairs survive iff BOTH gates pass; alt is the planted string;
    // all containers carry the block-constant content, so one pixel
    // CTE covers the three codecs
    "mm_image_text_pairs" ->
      s"""WITH img AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
             10 + doc_id % 15 AS h
           FROM documents
           WHERE doc_id % 3 = 0 AND (doc_id * 31 + 7) % 5 < 3),
         pages AS (SELECT doc_id AS page_id, doc_id - 1 AS ref
           FROM documents
           WHERE doc_id % 3 = 1 AND (doc_id * 31 + 7) % 5 < 3),
         px AS (SELECT media_id, w, h,
             ((media_id * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM img, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         stats AS (SELECT media_id, w, h, CAST(sum(v) AS BIGINT) AS sum_gray
           FROM px GROUP BY 1, 2, 3)
         SELECT s.media_id, p.page_id,
           'img ' || s.media_id || ' page ' || p.page_id AS alt,
           s.w::INT AS width, s.h::INT AS height, s.sum_gray
         FROM pages p JOIN stats s ON s.media_id = p.ref""",
    // every stage replayed: the status gate, the per-container strip
    // byte delta — which prices the REAL TIFF the fixture injected
    // (length 169+mb with GPS / 55+mb without, mb = model bytes) —
    // the stored-PNG out_len closed form, GPS presence, and the grid
    // hash over the normalized pixels
    "mm_warc_privacy_pipeline" ->
      s"""WITH img AS (SELECT doc_id AS media_id, doc_id // 9 AS seed,
             CASE ((doc_id // 3) % 3) WHEN 0 THEN 'gif'
                  WHEN 1 THEN 'png' ELSE 'jpeg' END AS container,
             16 + (doc_id // 9) % 24 AS w, 10 + (doc_id // 9) % 15 AS h,
             (8 + 42 + 5 + length('Mod' || (doc_id % 100)) + 1
               + CASE WHEN doc_id % 9 < 6 THEN 12 + 54 + 48 ELSE 0 END)
               AS tiff_len
           FROM documents
           WHERE doc_id % 3 = 0 AND (doc_id * 31 + 7) % 5 < 3),
         base AS (SELECT media_id, seed, container, w, h,
             CASE container
               WHEN 'gif' THEN 80 + media_id % 100 + media_id % 60
               WHEN 'png' THEN 56 + media_id % 64 + tiff_len
               ELSE 30 + media_id % 32 + tiff_len END AS n_stripped_bytes,
             (68 + h * (3 * w + 1)) AS out_len,
             (container != 'gif' AND media_id % 9 < 6) AS had_gps
           FROM img),
         px AS (SELECT media_id, w, h,
             (x.x * 9) // w AS i, (y.y * 8) // h AS j,
             ((seed * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM base, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         cells AS (SELECT media_id, i, j, (sum(v) // count(*)) AS m
           FROM px GROUP BY 1, 2, 3),
         bits AS (SELECT a.media_id, (a.j * 8 + a.i) AS k,
             CASE WHEN a.m < b.m THEN 1 ELSE 0 END AS bit
           FROM cells a JOIN cells b
             ON b.media_id = a.media_id AND b.j = a.j AND b.i = a.i + 1
           WHERE a.i < 8),
         packed AS (SELECT media_id,
             CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k)
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1)
         SELECT b.media_id, b.container, b.had_gps,
           b.n_stripped_bytes::BIGINT AS n_stripped_bytes,
           b.out_len::BIGINT AS out_len,
           printf('%08x%08x', p.hi, p.lo) AS dhash,
           count(*) OVER (PARTITION BY printf('%08x%08x', p.hi, p.lo))
             AS n_same_hash
         FROM base b JOIN packed p ON p.media_id = b.media_id""",
    // the byte delta is pure arithmetic (two 4-byte headers + the two
    // id-derived payloads); pixels replay via the mm_jpeg_pixels
    // block-formula CTE
    "mm_jpeg_strip_meta" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
             10 + doc_id % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             ((media_id * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM g, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y))
         SELECT media_id,
           (88 + media_id % 128 + media_id % 32)::BIGINT AS n_stripped_bytes,
           2::BIGINT AS n_segments_stripped,
           w::INT AS width, h::INT AS height,
           CAST(sum(v) AS BIGINT) AS sum_gray
         FROM px GROUP BY 1, 2, 3, 4, 5""",
    // comment ext = 4 + L1 bytes, application ext = 16 + L2 (11-byte
    // identifier sub-block + data sub-block + terminators)
    "mm_gif_strip_meta" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
             10 + doc_id % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             ((media_id * 31 + x.x * 7 + y.y * 13) % 256) AS v
           FROM g, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y))
         SELECT media_id,
           (80 + media_id % 100 + media_id % 60)::BIGINT AS n_stripped_bytes,
           2::BIGINT AS n_blocks_stripped,
           w::INT AS width, h::INT AS height,
           CAST(sum(v) AS BIGINT) AS sum_gray
         FROM px GROUP BY 1, 2, 3, 4, 5""",
    // byte delta = two 12-byte chunk frames + the id-derived payloads;
    // pixels replay via the per-pixel formula
    "mm_png_strip_meta" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
             10 + doc_id % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             ((media_id * 31 + x.x * 7 + y.y * 13) % 256) AS v
           FROM g, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y))
         SELECT media_id,
           (80 + media_id % 64 + media_id % 48)::BIGINT AS n_stripped_bytes,
           2::BIGINT AS n_chunks_stripped,
           w::INT AS width, h::INT AS height,
           CAST(sum(v) AS BIGINT) AS sum_gray
         FROM px GROUP BY 1, 2, 3, 4, 5""",
    // integer energy-contour replay: windows of 128 at hop 64 over
    // the seed-derived PCM, bit k = E(k+1) > E(k), same two-halves
    // hex rendering as the dHash oracle
    "mm_audio_dedup_fp" ->
      s"""WITH a AS (SELECT doc_id AS media_id, doc_id // 6 AS seed,
             1600 + (doc_id // 6) % 1600 AS n
           FROM documents WHERE doc_id % 3 = 1),
         v AS (SELECT media_id, o.o AS o, k.k AS k,
             ((((seed * 31 + k.k * 7) % 4096) - 2048)
               * (1 + ((seed // (1::BIGINT << ((k.k // 64) % 8))) % 2))) AS s
           FROM a, LATERAL unnest(range(0, n, 64)) AS o(o),
             LATERAL unnest(range(o.o, least(o.o + 128, n))) AS k(k)),
         e AS (SELECT media_id, (o // 64) AS i, sum(s * s) AS en
           FROM v GROUP BY 1, 2),
         bits AS (SELECT c.media_id, c.i AS k,
             CASE WHEN nx.en > c.en THEN 1 ELSE 0 END AS bit
           FROM e c JOIN e nx
             ON nx.media_id = c.media_id AND nx.i = c.i + 1
           WHERE c.i < 64),
         packed AS (SELECT media_id,
             CAST(sum(CASE WHEN k >= 32 THEN bit * (1::BIGINT << (k - 32))
                           ELSE 0 END) AS BIGINT) AS hi,
             CAST(sum(CASE WHEN k < 32 THEN bit * (1::BIGINT << k)
                           ELSE 0 END) AS BIGINT) AS lo
           FROM bits GROUP BY 1)
         SELECT p.media_id, a.n::BIGINT AS n_samples,
           ((a.n + 63) // 64)::BIGINT AS n_windows,
           printf('%08x%08x', p.hi, p.lo) AS fp,
           count(*) OVER (PARTITION BY printf('%08x%08x', p.hi, p.lo))
             AS n_same_fp
         FROM packed p JOIN a ON a.media_id = p.media_id""",
    // the pixel sums replay the per-container source formula (per-
    // pixel for the lossless trio, per-8x8-block for the DC-only JPEG
    // leg) and out_len is the stored-PNG framing arithmetic — both
    // only hold if the transcode preserved every pixel
    "mm_image_transcode" ->
      s"""WITH g AS (SELECT doc_id AS media_id, (doc_id // 3) % 4 AS fmt,
             16 + doc_id % 24 AS w, 10 + doc_id % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             (CASE WHEN fmt = 3
                THEN ((media_id * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256)
                ELSE ((media_id * 31 + x.x * 7 + y.y * 13) % 256) END) AS v
           FROM g, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y))
         SELECT media_id, w::BIGINT AS width, h::BIGINT AS height,
           (68 + h * (3 * w + 1))::BIGINT AS out_len,
           CAST(sum(v) AS BIGINT) AS sum_gray,
           CAST(min(v) AS BIGINT) AS min_gray,
           CAST(max(v) AS BIGINT) AS max_gray
         FROM px GROUP BY 1, 2, 3, 4""",
    // every flag replayed from the fixture arithmetic, including the
    // signed DMS -> milli-arc-second composition (den=1 rationals)
    "mm_exif_flags" ->
      s"""SELECT doc_id AS media_id,
           CASE WHEN (doc_id // 3) % 2 = 0 THEN 'jpeg' ELSE 'png' END
             AS container,
           CASE WHEN doc_id % 2 = 0 THEN 'II' ELSE 'MM' END AS byte_order,
           TRUE AS has_exif,
           (1 + doc_id % 8)::INT AS orientation,
           'Cam' || (doc_id % 10) AS make,
           'Mod' || (doc_id % 100) AS model,
           (doc_id % 9 < 6) AS has_gps,
           (CASE WHEN doc_id % 9 < 6 THEN
              (CASE WHEN (doc_id // 9) % 2 = 0 THEN 1 ELSE -1 END) *
                ((doc_id % 90) * 3600000 + (doc_id % 60) * 60000
                  + ((doc_id * 7) % 60) * 1000)
            ELSE 0 END)::BIGINT AS gps_lat_mas,
           (CASE WHEN doc_id % 9 < 6 THEN
              (CASE WHEN (doc_id // 18) % 2 = 0 THEN 1 ELSE -1 END) *
                (((doc_id * 3) % 180) * 3600000 + ((doc_id * 5) % 60) * 60000
                  + ((doc_id * 11) % 60) * 1000)
            ELSE 0 END)::BIGINT AS gps_lon_mas
         FROM documents WHERE doc_id % 3 = 0""",
    // per-frame replay: frame f is (w-f)x(h-f%3) at (f, f%3), delay
    // 10(f+1)+id%7 cs, pixels from the per-frame formula
    "mm_gif_frames" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
             10 + doc_id % 15 AS h, 2 + doc_id % 4 AS nf
           FROM documents WHERE doc_id % 3 = 0),
         fr AS (SELECT media_id, w, h, f.f AS f, f.f AS lft,
             (f.f % 3) AS tp, w - f.f AS fw, h - (f.f % 3) AS fh,
             10 * (f.f + 1) + media_id % 7 AS delay
           FROM g, LATERAL unnest(range(0, nf)) AS f(f)),
         px AS (SELECT media_id, f, lft, tp, fw, fh, delay,
             ((media_id * 31 + f * 97 + x.x * 7 + y.y * 13) % 256) AS v
           FROM fr, LATERAL unnest(range(0, fw)) AS x(x),
             LATERAL unnest(range(0, fh)) AS y(y))
         SELECT media_id, f::BIGINT AS frame_idx, lft::BIGINT AS "left",
           tp::BIGINT AS "top", fw::BIGINT AS width, fh::BIGINT AS height,
           delay::BIGINT AS delay_cs,
           CAST(sum(v) AS BIGINT) AS sum_gray,
           CAST(min(v) AS BIGINT) AS min_gray,
           CAST(max(v) AS BIGINT) AS max_gray
         FROM px GROUP BY media_id, f, lft, tp, fw, fh, delay""",
    // adjacent-pair |diff| replay from the frame formula; mean =
    // floor(sum/n) (nonneg), cut STRICTLY above 16, scenes = 1 + cuts
    "mm_gif_scene_cuts" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 20 + doc_id % 17 AS w,
             14 + doc_id % 11 AS h, 3 + doc_id % 4 AS nf
           FROM documents WHERE doc_id % 3 = 0),
         pr AS (SELECT media_id, w, h, t.t AS t
           FROM g, LATERAL unnest(range(1, nf)) AS t(t)),
         d AS (SELECT media_id, w, h, t,
             abs((((media_id * 31 + (t // 2) * 97 + (x.x // 4) * 7 +
                    (y.y // 4) * 13) % 240) + (t % 2) * 3) -
                 (((media_id * 31 + ((t - 1) // 2) * 97 + (x.x // 4) * 7 +
                    (y.y // 4) * 13) % 240) + ((t - 1) % 2) * 3)) AS ad
           FROM pr, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         p AS (SELECT media_id, t AS frame_idx, count(*) AS n_px,
             sum(ad) AS sum_abs_diff, (sum(ad) // count(*)) AS mean_diff
           FROM d GROUP BY 1, 2),
         c AS (SELECT *, (mean_diff > 16) AS is_cut FROM p)
         SELECT media_id, frame_idx::BIGINT AS frame_idx,
           n_px::BIGINT AS n_px, sum_abs_diff::BIGINT AS sum_abs_diff,
           mean_diff::BIGINT AS mean_diff, is_cut,
           CAST(1 + sum(CASE WHEN is_cut THEN 1 ELSE 0 END)
             OVER (PARTITION BY media_id) AS BIGINT) AS n_scenes
         FROM c""",
    // cut sequence -> prefix-sum scene ids -> first frame per scene,
    // rep pixel stats from the frame formula (weight = y*w + x + 1)
    "mm_gif_scene_reps" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 20 + doc_id % 17 AS w,
             14 + doc_id % 11 AS h, 3 + doc_id % 4 AS nf
           FROM documents WHERE doc_id % 3 = 0),
         pr AS (SELECT media_id, w, h, t.t AS t
           FROM g, LATERAL unnest(range(1, nf)) AS t(t)),
         d AS (SELECT media_id, t,
             abs((((media_id * 31 + (t // 2) * 97 + (x.x // 4) * 7 +
                    (y.y // 4) * 13) % 240) + (t % 2) * 3) -
                 (((media_id * 31 + ((t - 1) // 2) * 97 + (x.x // 4) * 7 +
                    (y.y // 4) * 13) % 240) + ((t - 1) % 2) * 3)) AS ad
           FROM pr, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         p AS (SELECT media_id, t, (sum(ad) // count(*)) AS mean_diff
           FROM d GROUP BY 1, 2),
         fr AS (SELECT media_id, w, h, t.t AS t
           FROM g, LATERAL unnest(range(0, nf)) AS t(t)),
         fc AS (SELECT fr.media_id, fr.w, fr.h, fr.t,
             CASE WHEN p.mean_diff > 16 THEN 1 ELSE 0 END AS cut
           FROM fr LEFT JOIN p
             ON p.media_id = fr.media_id AND p.t = fr.t),
         sc AS (SELECT *, sum(cut) OVER (PARTITION BY media_id
             ORDER BY t) AS scene FROM fc),
         agg AS (SELECT media_id, w, h, scene AS scene_idx,
             min(t) AS rep, count(*) AS n_frames
           FROM sc GROUP BY 1, 2, 3, 4),
         px AS (SELECT r.media_id, r.scene_idx, r.rep, r.n_frames,
             (y.y * r.w + x.x + 1) AS wgt,
             (((r.media_id * 31 + (r.rep // 2) * 97 + (x.x // 4) * 7 +
                (y.y // 4) * 13) % 240) + (r.rep % 2) * 3) AS v
           FROM agg r, LATERAL unnest(range(0, r.w)) AS x(x),
             LATERAL unnest(range(0, r.h)) AS y(y))
         SELECT media_id, scene_idx::BIGINT AS scene_idx,
           rep::BIGINT AS rep_frame_idx, n_frames::BIGINT AS n_frames,
           CAST(sum(v) AS BIGINT) AS rep_sum_gray,
           CAST(sum(wgt * v) AS BIGINT) AS rep_checksum
         FROM px GROUP BY 1, 2, 3, 4""",
    // the Peer/Kovac rule replayed per pixel from the channel formulas
    "mm_image_skin_ratio" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
             10 + doc_id % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, w, h,
             ((media_id * 31 + (x.x // 4) * 7 + (y.y // 4) * 13) % 256) AS r,
             ((media_id * 17 + (x.x // 4) * 11 + (y.y // 4) * 5) % 256) AS gg,
             ((media_id * 23 + (x.x // 4) * 3 + (y.y // 4) * 19) % 256) AS b
           FROM g, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y)),
         s AS (SELECT media_id, w, h, count(*) AS n,
             sum(CASE WHEN r > 95 AND gg > 40 AND b > 20
                   AND greatest(r, gg, b) - least(r, gg, b) > 15
                   AND abs(r - gg) > 15 AND r > gg AND r > b
                 THEN 1 ELSE 0 END) AS nskin
           FROM px GROUP BY 1, 2, 3)
         SELECT media_id, w::INT AS width, h::INT AS height,
           n::BIGINT AS n_px, nskin::BIGINT AS n_skin,
           (nskin * 1000000 // n)::BIGINT AS skin_ppm,
           (nskin * 1000000 // n) > 200000 AS flagged
         FROM s""",
    // canvas cell (oy+y)*side + (ox+x), pad cells contribute 0
    "mm_image_letterbox" ->
      s"""WITH g AS (SELECT doc_id AS media_id, 16 + doc_id % 24 AS w,
             10 + doc_id % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         dims AS (SELECT media_id, w, h, greatest(w, h) AS side,
             (greatest(w, h) - w) // 2 AS ox, (greatest(w, h) - h) // 2 AS oy
           FROM g),
         px AS (SELECT media_id, w, h, side, ox, oy,
             ((oy + y.y) * side + ox + x.x + 1) AS wt,
             ((media_id * 31 + x.x * 7 + y.y * 13) % 256) AS v
           FROM dims, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y))
         SELECT media_id, w::BIGINT AS width, h::BIGINT AS height,
           side::BIGINT AS side, ox::BIGINT AS offset_x,
           oy::BIGINT AS offset_y,
           CAST(sum(wt * v) AS BIGINT) AS checksum
         FROM px GROUP BY media_id, w, h, side, ox, oy""",
    // kept = [leadW*100, (leadW+midW)*100) plus the partial tail when
    // no trailing window is cut; every kept sample is the formula
    "mm_audio_trim" ->
      s"""WITH a AS (SELECT doc_id AS media_id, doc_id % 4 AS leadw,
             5 + doc_id % 6 AS midw, doc_id % 3 AS tailw,
             doc_id % 100 AS part
           FROM documents WHERE doc_id % 3 = 1),
         dims AS (SELECT media_id, leadw, midw, tailw,
             (leadw + midw + tailw) * 100 + part AS n_in,
             leadw * 100 AS frm,
             CASE WHEN tailw = 0 THEN (leadw + midw) * 100 + part
                  ELSE (leadw + midw) * 100 END AS endo
           FROM a),
         s AS (SELECT media_id, n_in, leadw, tailw, frm, endo, k.k AS k,
             (((media_id * 7 + k.k * 13) % 4000) - 2000) AS v
           FROM dims, LATERAL unnest(range(frm, endo)) AS k(k))
         SELECT media_id, n_in::BIGINT AS n_in,
           (endo - frm)::BIGINT AS n_kept,
           leadw::BIGINT AS n_lead_windows_cut,
           tailw::BIGINT AS n_tail_windows_cut,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(sum((k - frm + 1) * v) AS BIGINT) AS checksum
         FROM s GROUP BY media_id, n_in, leadw, tailw, frm, endo""",
    // the eight dihedral destination mappings replayed per case:
    // dst i/j as a function of src (sx, sy) and the orientation,
    // weight = (j*outW + i + 1), value = the DC-block formula
    "mm_exif_orient" ->
      s"""WITH g AS (SELECT doc_id AS media_id, (1 + doc_id % 8) AS o,
             16 + doc_id % 24 AS w, 10 + doc_id % 15 AS h
           FROM documents WHERE doc_id % 3 = 0),
         px AS (SELECT media_id, o, w, h,
             CASE WHEN o IN (1, 4) THEN x.x
                  WHEN o IN (2, 3) THEN w - 1 - x.x
                  WHEN o IN (5, 8) THEN y.y
                  ELSE h - 1 - y.y END AS i,
             CASE WHEN o IN (1, 2) THEN y.y
                  WHEN o IN (3, 4) THEN h - 1 - y.y
                  WHEN o IN (5, 6) THEN x.x
                  ELSE w - 1 - x.x END AS j,
             CASE WHEN o >= 5 THEN h ELSE w END AS ow,
             ((media_id * 31 + (x.x // 8) * 7 + (y.y // 8) * 13) % 256) AS v
           FROM g, LATERAL unnest(range(0, w)) AS x(x),
             LATERAL unnest(range(0, h)) AS y(y))
         SELECT media_id, o::INT AS orientation,
           ow::BIGINT AS out_w,
           (CASE WHEN o >= 5 THEN w ELSE h END)::BIGINT AS out_h,
           CAST(sum((j * ow + i + 1) * v) AS BIGINT) AS checksum
         FROM px GROUP BY media_id, o, w, h, ow""",
    // stereo frames mix as trunc((L+R)/2) toward zero; mono ids pass
    // through unchanged (the 1-channel case of the same mean)
    "mm_audio_mixdown" ->
      s"""WITH a AS (SELECT doc_id AS media_id,
             800 + doc_id % 800 AS n, ((doc_id // 3) % 2 = 0) AS stereo
           FROM documents WHERE doc_id % 3 = 1),
         f AS (SELECT media_id, n, stereo, k.k AS k,
             CASE WHEN stereo THEN
               ((((media_id * 13 + k.k * 7) % 4096) - 2048)
                 + (((media_id * 29 + k.k * 3) % 4096) - 2048)) // 2
             ELSE (((media_id * 13 + k.k * 7) % 4096) - 2048) END AS v
           FROM a, LATERAL unnest(range(0, n)) AS k(k))
         SELECT media_id,
           (CASE WHEN stereo THEN 2 ELSE 1 END)::INT AS n_channels,
           n::BIGINT AS n_frames,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(max(abs(v)) AS BIGINT) AS peak,
           CAST(sum((k + 1) * v) AS BIGINT) AS checksum
         FROM f GROUP BY media_id, n, stereo""",
    // decimated sample v_k = trunc(sum of 4 source samples / 4) —
    // DuckDB's integer // divides toward zero exactly like Java /,
    // exercised on signed sums
    "mm_audio_resample" ->
      s"""WITH a AS (SELECT doc_id AS media_id, 1200 + doc_id % 1200 AS n
           FROM documents WHERE doc_id % 3 = 1),
         w AS (SELECT media_id, n, k.k // 4 AS win,
             ((media_id * 23 + k.k * 11) % 4096) - 2048 AS s
           FROM a, LATERAL unnest(range(0, (n // 4) * 4)) AS k(k)),
         o AS (SELECT media_id, n, win, (sum(s) // 4) AS v
           FROM w GROUP BY 1, 2, 3)
         SELECT media_id, n::BIGINT AS n_in, (n // 4)::BIGINT AS n_out,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(max(abs(v)) AS BIGINT) AS peak,
           CAST(sum((win + 1) * v) AS BIGINT) AS checksum
         FROM o GROUP BY media_id, n""",
    // peak normalization: gain = (32767*2^15) // peak, v = (s*gain) //
    // 2^15 — both `//` truncate toward zero exactly like Java `/`
    "mm_audio_normalize" ->
      s"""WITH a AS (SELECT doc_id AS media_id, 800 + doc_id % 900 AS n
           FROM documents WHERE doc_id % 3 = 1),
         s AS (SELECT media_id, n, k.k AS k,
             ((media_id * 29 + k.k * 17) % 4096) - 2048 AS s
           FROM a, LATERAL unnest(range(0, n)) AS k(k)),
         p AS (SELECT media_id, n, max(abs(s)) AS peak
           FROM s GROUP BY 1, 2),
         g AS (SELECT media_id, n, peak,
             CASE WHEN peak = 0 THEN 32768
                  ELSE (32767 * 32768) // peak END AS gain
           FROM p),
         o AS (SELECT s.media_id, g.n, g.peak, g.gain, s.k,
             (s.s * g.gain) // 32768 AS v
           FROM s JOIN g ON s.media_id = g.media_id)
         SELECT media_id, n::BIGINT AS n, peak::BIGINT AS peak_in,
           gain::BIGINT AS gain_q15,
           CAST(max(abs(v)) AS BIGINT) AS peak_out,
           CAST(sum(v * v) AS BIGINT) AS energy,
           CAST(sum((k + 1) * v) AS BIGINT) AS checksum
         FROM o GROUP BY 1, 2, 3, 4""",
    "mm_wav_segments" ->
      s"""WITH a AS (SELECT doc_id AS media_id, 300 + doc_id % 450 AS ns
             FROM documents WHERE doc_id % 3 = 1),
         s AS (SELECT media_id, ns, o.o AS off, (o.o // 160) AS seg_idx,
               k.k AS k,
               ((media_id * 31 + k.k * 7) % 4096) - 2048 AS v
             FROM a,
               LATERAL unnest(range(0, ns, 160)) AS o(o),
               LATERAL unnest(range(o.o, least(o.o + 400, ns))) AS k(k))
         SELECT media_id, seg_idx, count(*) AS n_samples,
           CAST(sum(v * v) AS BIGINT) AS energy, max(abs(v)) AS peak
         FROM s GROUP BY 1, 2""",
    // FLAC fixture arithmetic: n = 500 + id % 700 samples,
    // s_k = (id*17 + k*13) % 8192 - 4096; windows 512 / hop 256 —
    // lossless codec => identical stats on both sides
    "mm_flac_segments" ->
      s"""WITH a AS (SELECT doc_id AS media_id, 500 + doc_id % 700 AS ns
             FROM documents WHERE doc_id % 3 = 1),
         s AS (SELECT media_id, ns, (o.o // 256) AS seg_idx, k.k AS k,
               ((media_id * 17 + k.k * 13) % 8192) - 4096 AS v
             FROM a,
               LATERAL unnest(range(0, ns, 256)) AS o(o),
               LATERAL unnest(range(o.o, least(o.o + 512, ns))) AS k(k))
         SELECT media_id, seg_idx, count(*) AS n_samples,
           CAST(sum(v * v) AS BIGINT) AS energy, max(abs(v)) AS peak
         FROM s GROUP BY 1, 2""",
    // sample-layout arithmetic: sizes from the id formula, offsets as
    // exclusive prefix sums, dts = i*delta, keyframe every 5th
    "mm_mp4_sample_ranges" ->
      s"""WITH v AS (SELECT doc_id AS media_id, 8 + doc_id % 20 AS n,
             256 + doc_id % 100 AS delta
           FROM documents WHERE doc_id % 3 = 2),
         s AS (SELECT media_id, delta, i.i AS i,
             20 + ((media_id * 7 + i.i * 13) % 40) AS sz
           FROM v, LATERAL unnest(range(0, n)) AS i(i))
         SELECT media_id, 1::BIGINT AS track_id, i::BIGINT AS sample_idx,
           CAST(coalesce(sum(sz) OVER (PARTITION BY media_id ORDER BY i
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS offset_in_mdat,
           sz::BIGINT AS size, (i * delta)::BIGINT AS dts,
           (i % 5 = 0) AS keyframe
         FROM s""",
    // timeline buckets: win = (i*delta) div 1024, counts per bucket
    "mm_mp4_bitrate" ->
      s"""WITH v AS (SELECT doc_id AS media_id, 8 + doc_id % 20 AS n,
             256 + doc_id % 100 AS delta
           FROM documents WHERE doc_id % 3 = 2),
         s AS (SELECT media_id, delta, i.i AS i,
             20 + ((media_id * 7 + i.i * 13) % 40) AS sz,
             (i.i % 5 = 0) AS key,
             (i.i * delta) // 1024 AS win
           FROM v, LATERAL unnest(range(0, n)) AS i(i))
         SELECT media_id, 1::BIGINT AS track_id, win::BIGINT AS window_idx,
           count(*)::BIGINT AS n_samples,
           CAST(sum(sz) AS BIGINT) AS n_bytes,
           CAST(sum(CASE WHEN key THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keyframes
         FROM s GROUP BY 1, 3""",
    // keyframes are samples i % 5 = 0; byte k = (id + i*31 + k) % 251
    "mm_mp4_keyframes" ->
      s"""WITH v AS (SELECT doc_id AS media_id, 8 + doc_id % 20 AS n,
             256 + doc_id % 100 AS delta
           FROM documents WHERE doc_id % 3 = 2),
         s AS (SELECT media_id, delta, i.i AS i,
             20 + ((media_id * 7 + i.i * 13) % 40) AS sz
           FROM v, LATERAL unnest(range(0, n)) AS i(i)
           WHERE i.i % 5 = 0),
         by AS (SELECT media_id, delta, i, sz, k.k AS k,
             ((media_id + i * 31 + k.k) % 251) AS b
           FROM s, LATERAL unnest(range(0, sz)) AS k(k))
         SELECT media_id, 1::BIGINT AS track_id, i::BIGINT AS sample_idx,
           (i * delta)::BIGINT AS dts, sz::BIGINT AS size,
           CAST(min(CASE WHEN k = 0 THEN b END) AS BIGINT) AS first_byte,
           CAST(min(CASE WHEN k = sz - 1 THEN b END) AS BIGINT) AS last_byte,
           CAST(sum((k + 1) * b) AS BIGINT) AS checksum
         FROM by GROUP BY media_id, delta, i, sz""",
    "mm_resize_cksum" ->
      s"""WITH p AS (
           SELECT doc_id, text, greatest(length(text) // 64, 1) AS stride,
             least(64, length(text)) AS n_out
           FROM documents)
         SELECT doc_id AS media_id, n_out::BIGINT AS n_out,
           list_reduce(list_prepend(0::BIGINT,
             list_transform(range(0, n_out), i -> ord(substr(text, (i * stride)::INT + 1, 1))::BIGINT)),
             (acc, c) -> (acc * 31 + c) % 1000000007) AS cksum
         FROM p""")
}
