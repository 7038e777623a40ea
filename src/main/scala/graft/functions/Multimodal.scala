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

/** Decoded per-audio features: sample-level stats from a real sample
  * decode (PCM / G.711), or the labeled stand-in for codecs the JVM
  * lacks (`decoded = false`, stats over raw container bytes). */
final case class AudioFeature(
    media_id: Long,
    decoded: Boolean,
    sample_rate: Int,
    channels: Int,
    n_samples: Int,
    rms: Double,
    peak: Double)

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
  * The decode step is real for every format the JVM can decode without
  * external libraries: BMP images and RIFF/WAVE audio via hand-parsed
  * headers (width/height from the DIB header; sample rate, channels,
  * sample count from the fmt/data chunks), compressed JPEG / PNG /
  * GIF via the JDK's own `javax.imageio.ImageIO` (headless-safe, no
  * Toolkit), and WAV sample payloads — PCM 8/16-bit plus the G.711
  * μ-law/A-law companded codecs — via [[decodeAudio]]'s pure-JVM
  * expansion. Codecs the JDK doesn't ship (MP4/H.264/Opus/…) fall back
  * to a clearly-marked deterministic stand-in. Everything around
  * decode — the binary+metadata schema, the typed `Dataset` encoders,
  * `mapPartitions` batching (one iterator per partition, codec state
  * initialized once per partition, zero driver involvement), and the
  * downstream aggregations — is the real 100 TB shape: add a video
  * decoder branch and nothing else changes.
  */
object Multimodal {

  /** Synthesize an opaque payload column from any string column (test
    * stand-in for real image/audio bytes). */
  def payloadFrom(df: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      lit(kind).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** BMP: 'BM' magic, int32-LE width at 18, height at 22 (negative =
    * top-down row order → abs). Returns (width, height, 1 frame). */
  private def decodeBmp(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 26 && b(0) == 'B' && b(1) == 'M') {
      val w = le32(b, 18); val h = math.abs(le32(b, 22))
      if (w > 0 && h > 0) Some((w, h, 1)) else None // malformed → stand-in
    } else None

  /** One hardened RIFF/WAVE chunk walk shared by the header decode and
    * the sample decode — the two copies had already drifted (different
    * fmt-length guards); any future hardening lands once. Untrusted
    * opaque payloads: a negative or Int-overflowing declared chunk size
    * means "not a valid WAV" (stand-in fallback), never a stuck or
    * thrown task. */
  private final case class WavLayout(
      fmtTag: Int, channels: Int, rate: Int, bits: Int, blockAlign: Int,
      dataOff: Int, dataLen: Int)

  private def walkWav(b: Array[Byte]): Option[WavLayout] = {
    def tag(off: Int, s: String): Boolean =
      off + 4 <= b.length && s.indices.forall(i => b(off + i) == s.charAt(i))
    if (!(tag(0, "RIFF") && tag(8, "WAVE"))) return None
    var i = 12
    var fmtTag = 0; var rate = 0; var channels = 0; var bits = 0
    var blockAlign = 0; var dataOff = -1; var dataLen = 0
    while (i + 8 <= b.length) {
      val size = le32(b, i + 4)
      if (size < 0) return None
      if (tag(i, "fmt ") && i + 24 <= b.length) {
        fmtTag = le16(b, i + 8)
        channels = le16(b, i + 10)
        rate = le32(b, i + 12)
        blockAlign = le16(b, i + 20)
        bits = le16(b, i + 22)
      } else if (tag(i, "data")) {
        dataOff = i + 8
        dataLen = math.max(0, math.min(size, b.length - dataOff))
      }
      val next = i.toLong + 8L + size.toLong + (size & 1) // word-aligned
      if (next > Int.MaxValue) return None
      i = next.toInt
    }
    if (rate <= 0 || channels <= 0) None
    else Some(WavLayout(fmtTag, channels, rate, bits, blockAlign, dataOff, dataLen))
  }

  private def decodeWav(b: Array[Byte]): Option[(Int, Int, Int)] =
    walkWav(b).map(w => (w.rate, w.channels,
      if (w.blockAlign > 0) w.dataLen / w.blockAlign else 0))

  /** G.711 μ-law byte → 16-bit-scale linear sample (the public CCITT
    * spec's segment/mantissa arithmetic; ±32124 full scale). */
  private def ulawToLinear(b: Byte): Int = {
    val u = ~b & 0xff
    var t = ((u & 0x0f) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    if ((u & 0x80) != 0) 0x84 - t else t - 0x84
  }

  /** G.711 A-law byte → 16-bit-scale linear sample (±32256 full scale;
    * sign bit set means positive, unlike μ-law). */
  private def alawToLinear(b: Byte): Int = {
    val a = (b ^ 0x55) & 0xff
    val seg = (a & 0x70) >> 4
    var t = (a & 0x0f) << 4
    if (seg == 0) t += 8
    else { t += 0x108; if (seg > 1) t <<= seg - 1 }
    if ((a & 0x80) != 0) t else -t
  }

  /** WAV sample decode — the real codec step for every format tag the
    * container can carry without external libraries: PCM 8/16-bit
    * (fmt 1), A-law (fmt 6), μ-law (fmt 7). Returns (sample_rate,
    * channels, interleaved samples normalized to [-1, 1]). Same hardened
    * chunk walk as [[decodeWav]]: malformed sizes mean "not audio",
    * never a stuck or thrown task. */
  private[functions] def decodeAudio(b: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    walkWav(b).filter(_.dataOff >= 0).flatMap { w =>
      val (rate, channels, dataOff, dataLen) = (w.rate, w.channels, w.dataOff, w.dataLen)
      (w.fmtTag, w.bits) match {
        case (1, 16) =>
          val n = dataLen / 2
          Some((rate, channels, Array.tabulate(n) { j =>
            le16(b, dataOff + 2 * j).toShort / 32768.0
          }))
        case (1, 8) => // 8-bit PCM is unsigned with midpoint 128
          Some((rate, channels, Array.tabulate(dataLen) { j =>
            ((b(dataOff + j) & 0xff) - 128) / 128.0
          }))
        case (6, _) =>
          Some((rate, channels, Array.tabulate(dataLen) { j =>
            alawToLinear(b(dataOff + j)) / 32768.0
          }))
        case (7, _) =>
          Some((rate, channels, Array.tabulate(dataLen) { j =>
            ulawToLinear(b(dataOff + j)) / 32768.0
          }))
        case _ => None // compressed tags the JVM can't expand unaided
      }
    }
  }

  /** Compressed images (JPEG / PNG / GIF) through the JDK's ImageIO —
    * a full decode, not a header peek (magic-gated so arbitrary bytes
    * never reach the codec search). ImageIO.read returns null when no
    * reader claims the stream; Option covers it. */
  private def decodeImage(b: Array[Byte]): Option[(Int, Int, Int)] = {
    val jpeg = b.length > 3 &&
      (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8 && (b(2) & 0xff) == 0xff
    val png = b.length > 8 && (b(0) & 0xff) == 0x89 &&
      b(1) == 'P' && b(2) == 'N' && b(3) == 'G'
    val gif = b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8'
    if (!(jpeg || png || gif)) None
    else Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b)))
      .map(img => (img.getWidth, img.getHeight, 1))
  }

  /** Decode: real for BMP/WAV (hand-parsed headers) and JPEG/PNG/GIF
    * (JDK ImageIO); STUB fallback (deterministic fake in place of a
    * codec call) only for formats the JVM cannot decode unaided. */
  private[functions] def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
    // Try: any malformed container that still escapes the parsers'
    // structural checks degrades to the stand-in like unknown formats do
    scala.util.Try(decodeBmp(payload).orElse(decodeWav(payload))
        .orElse(decodeImage(payload)))
      .toOption.flatten.getOrElse {
      val n = payload.length
      val w = 64 + (n % 577)                       // fake width
      val h = 64 + ((n.toLong * 31) % 419).toInt   // fake height (no Int overflow)
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

  /** Audio feature extraction over decoded samples — the same
    * partition-batched shape as [[extractFeatures]], but the payload
    * goes through a REAL sample decode (PCM 8/16, G.711 μ-law/A-law via
    * [[decodeAudio]]): per-payload RMS and peak amplitude on the
    * normalized waveform. Non-audio/unsupported payloads degrade to the
    * labeled stand-in (`decoded = false`) with byte-level pseudo-stats,
    * keeping the row — pipeline cardinality never depends on codec
    * coverage. */
  def extractAudioFeatures(spark: SparkSession, media: DataFrame): Dataset[AudioFeature] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.map { r =>
        scala.util.Try(decodeAudio(r.payload)).toOption.flatten match {
          case Some((rate, channels, samples)) =>
            var sumSq = 0.0; var peak = 0.0
            samples.foreach { s =>
              sumSq += s * s; val a = math.abs(s); if (a > peak) peak = a
            }
            val rms = if (samples.isEmpty) 0.0 else math.sqrt(sumSq / samples.length)
            AudioFeature(r.media_id, decoded = true, rate, channels,
              samples.length, rms, peak)
          case None => // stand-in: stats over raw bytes, clearly labeled
            var sumSq = 0.0; var peak = 0.0
            r.payload.foreach { b =>
              val s = b / 128.0
              sumSq += s * s; val a = math.abs(s); if (a > peak) peak = a
            }
            val rms = if (r.payload.isEmpty) 0.0
              else math.sqrt(sumSq / r.payload.length)
            AudioFeature(r.media_id, decoded = false, 0, 0,
              r.payload.length, rms, peak)
        }
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
