package graft.mm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** Multimodal-column plumbing for training-data pipelines: image/audio/video
  * payloads as opaque `binary` columns with typed metadata, processed in
  * partition-sized batches.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries): [[decodeStub]] produces a deterministic fake feature vector
  * from the bytes. Everything around it — schema, partitioning, batch
  * iteration shape, frame-sampling fan-out — is real Spark plumbing and
  * tested; swapping the stub for a JNI/ONNX decoder changes one function.
  */
object Multimodal {

  /** A media row: kind ∈ {image, audio, video}. */
  final case class Media(
      media_id: Long,
      kind: String,
      bytes: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long)

  final case class MediaFeature(media_id: Long, feature: Array[Float])

  final case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Deterministic synthetic media table (payload bytes derived from
    * splitmix64 of the id — stands in for real WARC payloads).
    */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = (i % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      val len = 64 + (graft.functions.SplitMix64Expr.mix(i) & 0xff).toInt
      val bytes = Array.tabulate(len)(j =>
        (graft.functions.SplitMix64Expr.mix(i * 131071L + j) & 0xff).toByte)
      Media(i, kind, bytes, 16 + (i % 64).toInt, 16 + (i % 48).toInt,
        1000L + i % 10000)
    }
  }

  /** STUB decode: a deterministic 8-dim "feature" from the payload bytes.
    * Real pipelines replace this body with an image/audio decoder; the
    * batched `mapPartitions` shape (one heavyweight codec context per
    * partition, row-streamed) is the part that matters at scale.
    */
  def decodeStub(bytes: Array[Byte]): Array[Float] = {
    val h0 = bytes.foldLeft(0L)((acc, b) =>
      graft.functions.SplitMix64Expr.mix(acc ^ (b & 0xffL)))
    Array.tabulate(8)(j =>
      (graft.functions.SplitMix64Expr.mix(h0 + j) % 1000).toFloat / 1000f)
  }

  /** Feature extraction over the media table: partition-batched typed
    * mapPartitions (the Scala analogue of a pandas_udf over mapInPandas —
    * one codec context per partition, streaming rows, constant memory).
    */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeature] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec" initialization would go here
      rows.map(m => MediaFeature(m.media_id, decodeStub(m.bytes)))
    }
  }

  /** Deterministic frame sampling for video rows: every `everyMs`
    * milliseconds, emit a (media_id, frame_idx, frame_bytes) row — fan-out
    * via flatMap, so a 2-hour video becomes rows, not memory.
    * Frame bytes are stub slices of the payload.
    */
  def sampleFrames(media: Dataset[Media], everyMs: Long = 1000L): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      val n = math.max(1L, m.duration_ms / everyMs).toInt
      (0 until n).iterator.map { f =>
        val off = (f * 7) % math.max(1, m.bytes.length - 8)
        Frame(m.media_id, f, m.bytes.slice(off, off + 8))
      }
    }
  }

  /** Metadata-only resize plan (no pixel work in the stub): target box with
    * aspect preserved — the typical first stage of an image pipeline,
    * pushed down as a pure projection.
    */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val scale = least(
      lit(maxSide.toDouble) / greatest(col("width"), lit(1)),
      lit(maxSide.toDouble) / greatest(col("height"), lit(1)),
      lit(1.0))
    media.select(col("media_id"), col("kind"), col("width"), col("height"),
      ceil(col("width") * scale).cast("int").as("out_width"),
      ceil(col("height") * scale).cast("int").as("out_height"))
  }
}
