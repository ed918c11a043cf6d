package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, plus batched decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing (schema, partition-preserving mapPartitions over
  * batches, output shapes) is real and tested. The actual codec step is a
  * STUB — no image/audio libraries ship in this container — implemented as a
  * clearly-marked deterministic fake that derives "pixels"/"samples" from the
  * bytes, so the pipeline shape, batching and determinism are exercised
  * end-to-end. In production the stub body is the only thing to replace
  * (e.g. with a JNI codec or, on PySpark, a pandas-batched UDF via
  * mapInPandas — same row-batch contract as [[mapBatched]] here).
  */
object Multimodal {

  /** Typed media row: kind ∈ {image, audio, video}. */
  final case class MediaRow(doc_id: Long, kind: String, bytes: Array[Byte],
      width: Int, height: Int, sampleRateHz: Int, durationMs: Int)

  final case class ImageFeatures(doc_id: Long, width: Int, height: Int,
      meanLuma: Double, features: Array[Float])

  final case class AudioFeatures(doc_id: Long, sampleRateHz: Int,
      rms: Double, features: Array[Float])

  final case class VideoFrames(doc_id: Long, frameIdx: Int,
      frameFeatures: Array[Float])

  /** Deterministic synthetic media table derived from the documents table —
    * the binary payload is the UTF-8 text (stand-in for real WARC payloads).
    */
  def mediaFromDocuments(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio").otherwise("video").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      (col("doc_id") % 640 + 16).cast("int").as("width"),
      (col("doc_id") % 480 + 16).cast("int").as("height"),
      lit(16000).as("sampleRateHz"),
      (col("doc_id") % 30000 + 1000).cast("int").as("durationMs"))

  // ===========================================================================
  // STUB DECODERS — deterministic fakes; replace with real codecs in prod.
  // ===========================================================================

  /** STUB: "decode" an image by folding its bytes; real impl: JPEG/PNG codec. */
  private[multimodal] def decodeImageStub(bytes: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var i = 0
    while (i < bytes.length) {
      out(i % dim) += (bytes(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** STUB: "decode" audio to a pseudo-waveform RMS; real impl: PCM decode. */
  private[multimodal] def decodeAudioStub(bytes: Array[Byte]): Double = {
    var acc = 0.0
    var i = 0
    while (i < bytes.length) {
      val v = ((bytes(i) & 0xff) - 128) / 128.0
      acc += v * v
      i += 1
    }
    if (bytes.isEmpty) 0.0 else math.sqrt(acc / bytes.length)
  }

  // ===========================================================================
  // Operators — partition-preserving, batched, no shuffle.
  // ===========================================================================

  /** The batching contract shared by all decode operators: process rows in
    * fixed-size batches inside each partition (the JVM analog of
    * mapInPandas' Arrow record batches — bounded memory per batch, codec
    * state amortized across a batch, partitioning preserved). */
  def mapBatched[T, U](ds: Dataset[T], batchSize: Int)(
      f: Seq[T] => Iterator[U])(implicit enc: org.apache.spark.sql.Encoder[U]): Dataset[U] =
    ds.mapPartitions(it => it.grouped(batchSize).flatMap(g => f(g)))

  /** Image decode + feature extraction (stubbed decode, real plumbing). */
  def imageFeatures(spark: SparkSession, media: DataFrame,
      featureDim: Int = 64, batchSize: Int = 256): Dataset[ImageFeatures] = {
    import spark.implicits._
    val imgs = media.where(col("kind") === "image")
      .select("doc_id", "kind", "bytes", "width", "height", "sampleRateHz", "durationMs")
      .as[MediaRow]
    mapBatched(imgs, batchSize) { batch =>
      batch.iterator.map { m =>
        val feats = decodeImageStub(m.bytes, featureDim)
        val luma = if (feats.isEmpty) 0.0 else feats.map(_.toDouble).sum / feats.length
        ImageFeatures(m.doc_id, m.width, m.height, luma, feats)
      }
    }
  }

  /** "Resize": recompute features at a new dimension (stub decode). */
  def resizeImages(spark: SparkSession, media: DataFrame, newDim: Int,
      batchSize: Int = 256): Dataset[ImageFeatures] =
    imageFeatures(spark, media, newDim, batchSize)

  /** Audio feature extraction (stubbed decode, real plumbing). */
  def audioFeatures(spark: SparkSession, media: DataFrame,
      featureDim: Int = 32, batchSize: Int = 256): Dataset[AudioFeatures] = {
    import spark.implicits._
    val auds = media.where(col("kind") === "audio")
      .select("doc_id", "kind", "bytes", "width", "height", "sampleRateHz", "durationMs")
      .as[MediaRow]
    mapBatched(auds, batchSize) { batch =>
      batch.iterator.map { m =>
        AudioFeatures(m.doc_id, m.sampleRateHz, decodeAudioStub(m.bytes),
          decodeImageStub(m.bytes, featureDim))
      }
    }
  }

  /** Frame sampling: every `everyMs` ms of "video", one frame row (stub
    * decode per frame; frame count = durationMs/everyMs, capped). */
  def sampleFrames(spark: SparkSession, media: DataFrame, everyMs: Int = 1000,
      maxFrames: Int = 16, featureDim: Int = 16,
      batchSize: Int = 64): Dataset[VideoFrames] = {
    import spark.implicits._
    val vids = media.where(col("kind") === "video")
      .select("doc_id", "kind", "bytes", "width", "height", "sampleRateHz", "durationMs")
      .as[MediaRow]
    mapBatched(vids, batchSize) { batch =>
      batch.iterator.flatMap { m =>
        val n = math.min(math.max(m.durationMs / everyMs, 1), maxFrames)
        (0 until n).iterator.map { f =>
          // stub "seek": fold a per-frame byte slice
          val slice = m.bytes.drop(f % math.max(m.bytes.length, 1))
          VideoFrames(m.doc_id, f, decodeImageStub(slice, featureDim))
        }
      }
    }
  }
}
