package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video as opaque `binary` columns
  * with typed metadata, plus the decode/feature-extract/resize/frame-sample
  * plumbing a training-data pipeline needs.
  *
  * The container has no codec libraries, so the *decode* step is a
  * clearly-marked deterministic STUB ([[StubCodec]]); everything around it
  * — schema, `Dataset[MediaRecord]` encoders, per-partition batch shape
  * (decoder initialized once per partition, the same pattern a real
  * JNI/FFmpeg binding needs), partitioning — is real and tested.
  *
  * Scale design: media bytes travel as parquet binary; per-record work is
  * `mapPartitions` (no per-row codec setup, no driver involvement), so the
  * stage parallelizes by input split exactly like any other scan.
  */
object Multimodal {

  final case class MediaMeta(width: Int, height: Int, sampleRate: Int, durationMs: Long)
  final case class MediaRecord(media_id: Long, kind: String, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
      byte_sum: Long, byte_mean: Double, frames_sampled: Int, thumb_w: Int, thumb_h: Int)

  /** STUB decoder — the real implementation would bind libjpeg/ffmpeg.
    * Deterministic fake "pixels": the raw bytes themselves. The interface
    * (bytes → frames of bytes) matches what a real codec returns, so
    * swapping in a real binding changes no plumbing. */
  object StubCodec {
    /** ??? in spirit: a real codec goes here. Deterministic fake decode. */
    def decodeFrames(content: Array[Byte], nFrames: Int): Seq[Array[Byte]] = {
      val stride = math.max(1, content.length / math.max(nFrames, 1))
      (0 until math.min(nFrames, content.length)).map { i =>
        content.slice(i * stride, math.min(i * stride + stride, content.length))
      }
    }

    /** Fake resize: target dims only (a real impl rescales pixel data). */
    def resize(meta: MediaMeta, w: Int, h: Int): MediaMeta = meta.copy(width = w, height = h)
  }

  /** Fixture adapter: deterministic media records synthesized from the
    * documents table (text bytes as payload; metadata derived from sizes). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sampleRate"),
        (col("n_chars") * 10).cast("long").as("durationMs")).as("meta"))

  final case class FrameSample(media_id: Long, frame_idx: Int, frame_len: Long, frame_sum: Long)

  /** Frame sampling: decode up to `framesPerItem` frames per record and
    * emit one row per frame — the video/audio sampling step of a training
    * pipeline. Same per-partition decoder-init pattern as
    * [[extractFeatures]]; output cardinality is bounded at
    * records × framesPerItem regardless of media size. */
  def sampleFrames(media: Dataset[MediaRecord], framesPerItem: Int = 4): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val codec = StubCodec // real codecs initialize native state here
      it.flatMap { m =>
        codec.decodeFrames(m.content, framesPerItem).zipWithIndex.map { case (f, i) =>
          FrameSample(m.media_id, i, f.length.toLong,
            f.foldLeft(0L)((a, b) => a + (b & 0xff)))
        }
      }
    }
  }

  /** Feature extraction over binary content: one decoder per PARTITION
    * (the expensive-init pattern), streaming through records. */
  def extractFeatures(media: Dataset[MediaRecord], framesPerItem: Int = 4): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // real codecs initialize native state here, once per partition
      val codec = StubCodec
      it.map { m =>
        val frames = codec.decodeFrames(m.content, framesPerItem)
        val sum = m.content.foldLeft(0L)((a, b) => a + (b & 0xff))
        val resized = codec.resize(m.meta, 64, 64)
        MediaFeatures(m.media_id, m.kind, m.content.length.toLong, sum,
          if (m.content.length == 0) 0.0 else sum.toDouble / m.content.length,
          frames.length, resized.width, resized.height)
      }
    }
  }
}
