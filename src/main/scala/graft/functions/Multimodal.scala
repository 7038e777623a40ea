package graft.functions

import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One opaque media payload with typed metadata — the multimodal column
  * model: binary bytes + a (kind, declared dims) descriptor, as parquet
  * `BINARY` + struct columns. */
final case class MediaRecord(
    media_id: Long,
    kind: String,
    payload: Array[Byte])

/** Decoded per-media features (the output of the decode/feature stage). */
final case class MediaFeature(
    media_id: Long,
    kind: String,
    size_bytes: Int,
    width: Int,
    height: Int,
    frames: Int,
    fingerprint: Long)

/** Multimodal-column plumbing (BASELINE.json north star): image/audio/
  * video as opaque `BINARY` columns processed partition-batched on
  * executors.
  *
  * The decode step is a clearly-marked STUB: this container ships no
  * image/audio codecs, so `decode` derives features deterministically
  * from the payload bytes. Everything around it — the binary+metadata
  * schema, the typed `Dataset` encoders, `mapPartitions` batching (one
  * iterator per partition, codec state initialized once per partition,
  * zero driver involvement), and the downstream aggregations — is the
  * real 100 TB shape: swap `decode` for a JPEG/PCM decoder and nothing
  * else changes.
  */
object Multimodal {

  /** Synthesize an opaque payload column from any string column (test
    * stand-in for real image/audio bytes). */
  def payloadFrom(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  /** STUB decode — deterministic fake in place of a codec call. */
  private[functions] def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) = {
    // a real implementation would decode the container/frame headers here
    val n = payload.length
    val w = 64 + (n % 577)           // fake width
    val h = 64 + ((n * 31) % 419)    // fake height
    val frames = if (kind == "video") 1 + n % 120 else 1
    (w, h, frames)
  }

  /** Partition-batched decode/feature-extract: one executor-side pass,
    * per-partition codec initialization, streaming iterator in/out. */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeature] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition init would construct the codec once here
      val crc = new CRC32()
      it.map { r =>
        val (w, h, frames) = decode(r.kind, r.payload)
        crc.reset(); crc.update(r.payload)
        MediaFeature(r.media_id, r.kind, r.payload.length, w, h, frames, crc.getValue)
      }
    }
  }

  /** "Resize" planning stage: pure column math over decoded dims (the
    * real pixel work would ride the same mapPartitions shape as decode). */
  def resizePlan(features: Dataset[MediaFeature], maxSide: Int): DataFrame =
    features.toDF()
      .withColumn("scale",
        least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))))
      .withColumn("out_width", ceil(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", ceil(col("height") * col("scale")).cast("int"))

  /** Frame-sampling plan for video payloads: every k-th frame index. */
  def frameSamplePlan(features: Dataset[MediaFeature], everyK: Int): DataFrame =
    features.toDF()
      .filter(col("kind") === "video")
      .withColumn("sampled_frames",
        sequence(lit(0), col("frames") - 1, lit(everyK)))
}
