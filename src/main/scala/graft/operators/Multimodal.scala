package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image / audio / video) column handling for training-data
  * pipelines: media travels as an opaque `binary` column plus typed
  * metadata; decode / feature-extract / resize / frame-sample run as
  * partition-batched transforms.
  *
  * The Spark-side plumbing here is real and tested — schema contracts,
  * partition batching, metadata propagation, deterministic outputs. The
  * codec calls themselves are STUBS (this environment ships no image or
  * audio libraries): [[FakeCodec]] derives deterministic pseudo-metadata
  * and pseudo-pixels from the bytes. Swapping in a real codec changes
  * only the body of the `decode*` functions — every signature, schema,
  * and batch shape stays as-is.
  *
  * Batching note: transforms use mapPartitions over a typed Dataset —
  * one JVM-side loop per partition, no per-row UDF setup cost; the
  * Python-side equivalent would be mapInPandas with arrow batches.
  */
object Multimodal {

  /** The canonical media row: id + kind + raw payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = true)))

  final case class MediaMeta(
      media_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, n_frames: Int, sample_rate: Int)

  final case class MediaFeature(
      media_id: Long, n_bytes: Long, checksum: Long, feature: Array[Float])

  /** STUB codec: deterministic pseudo-decode derived only from the
    * payload bytes — stands in for libjpeg/ffmpeg/soundfile. Replace the
    * bodies (not the shapes) to go real. */
  object FakeCodec {
    def imageDims(bytes: Array[Byte]): (Int, Int) = {
      val n = bytes.length.toLong
      (64 + (n % 512).toInt, 64 + (n * 31 % 512).toInt)
    }
    def frameCount(bytes: Array[Byte]): Int = 1 + bytes.length % 30
    def sampleRate(kind: String): Int = kind match {
      case "audio" => 16000
      case "video" => 30
      case _ => 0
    }
    /** Pseudo-pixel plane: every stride-th byte, sign-extended. */
    def samplePlane(bytes: Array[Byte], stride: Int, maxLen: Int): Array[Float] = {
      val out = new Array[Float](math.min(maxLen, (bytes.length + stride - 1) / stride))
      var i = 0
      while (i < out.length) { out(i) = bytes(i * stride).toFloat; i += 1 }
      out
    }
    def checksum(bytes: Array[Byte]): Long = {
      var h = 0L
      var i = 0
      while (i < bytes.length) { h = (h * 31 + (bytes(i) & 0xff)) % 1000000007L; i += 1 }
      h
    }
  }

  /** Wrap any table with a string payload column into the canonical
    * media shape (deterministic test payloads; real pipelines would
    * read binary files or parquet binary columns directly). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String,
      kindExpr: org.apache.spark.sql.Column): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      kindExpr.as("kind"),
      col(payloadCol).cast("binary").as("bytes"))

  /** Decode metadata per media row (dims / frames / sample rate) —
    * partition-batched, typed output. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = Encoders.product[MediaMeta]
    media.select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0); val kind = r.getString(1)
          val bytes = r.getAs[Array[Byte]](2)
          val (w, h) = FakeCodec.imageDims(bytes)
          MediaMeta(id, kind, bytes.length.toLong, w, h,
            FakeCodec.frameCount(bytes), FakeCodec.sampleRate(kind))
        }
      }(enc).toDF()
  }

  /** Feature extraction: fixed-dim float vector per media item (here:
    * a 16-dim pseudo-embedding from sampled bytes) + checksum. The
    * output feeds [[Similarity]] unchanged. */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val enc = Encoders.product[MediaFeature]
    media.select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val plane = FakeCodec.samplePlane(bytes, stride = 7, maxLen = dim)
          val padded = if (plane.length >= dim) plane.take(dim)
            else plane ++ Array.fill(dim - plane.length)(0f)
          MediaFeature(id, bytes.length.toLong, FakeCodec.checksum(bytes), padded)
        }
      }(enc).toDF()
  }

  /** Frame sampling for video-kind rows: explode each payload into
    * every k-th "frame" (stub: fixed-size byte windows), keyed
    * (media_id, frame_idx) — the 1->N generator shape. */
  def sampleFrames(media: DataFrame, everyK: Int = 4, frameBytes: Int = 32): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY)
    media.filter(col("kind") === "video").select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val nFrames = math.max(1, bytes.length / frameBytes)
          (0 until nFrames by everyK).iterator.map { f =>
            val from = f * frameBytes
            (id, f, java.util.Arrays.copyOfRange(bytes, from,
              math.min(from + frameBytes, bytes.length)))
          }
        }
      }(enc).toDF("media_id", "frame_idx", "frame_bytes")
  }

  /** Audio windowing for audio-kind rows: overlapping fixed-length
    * sample windows (window/hop in samples — the 25 ms / 10 ms speech
    * framing shape; stub treats each byte as one sample). One window
    * per hop offset strictly inside the payload, the last window
    * truncated at the payload end — keyed (media_id, seg_idx), the
    * same 1->N generator shape as [[sampleFrames]] with stride
    * overlap. */
  def segmentAudio(media: DataFrame, windowSamples: Int = 400,
      hopSamples: Int = 160): DataFrame = {
    require(windowSamples > 0 && hopSamples > 0)
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.scalaInt, Encoders.BINARY)
    media.filter(col("kind") === "audio").select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.flatMap { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val offsets = bytes.indices.by(hopSamples)
          offsets.iterator.zipWithIndex.map { case (off, idx) =>
            (id, idx, java.util.Arrays.copyOfRange(bytes, off,
              math.min(off + windowSamples, bytes.length)))
          }
        }
      }(enc).toDF("media_id", "seg_idx", "seg_bytes")
  }

  /** "Resize": renormalize the pseudo-pixel plane to a target cell
    * count by uniform re-striding (stub for a real resampler). */
  def resize(media: DataFrame, targetCells: Int): DataFrame = {
    val enc = Encoders.tuple(Encoders.scalaLong, Encoders.BINARY)
    media.select("media_id", "kind", "bytes")
      .mapPartitions { it: Iterator[Row] =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](2)
          val stride = math.max(1, bytes.length / targetCells)
          val out = new Array[Byte](math.min(targetCells, bytes.length))
          var i = 0
          while (i < out.length) { out(i) = bytes(i * stride); i += 1 }
          (id, out)
        }
      }(enc).toDF("media_id", "resized_bytes")
  }
}
