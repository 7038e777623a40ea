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
  * Toolkit), WAV sample payloads — PCM 8/16-bit plus the G.711
  * μ-law/A-law companded codecs — via [[decodeAudio]]'s pure-JVM
  * expansion, MP4 container METADATA via a hand-parsed ISO BMFF box
  * walk ([[decodeMp4]]: brand, duration, track count, video dims,
  * frame count, codec fourccs), and Ogg/Opus container metadata
  * ([[decodeOpusOgg]]: channels, pre-skip, granule duration). Only
  * compressed frame/packet PAYLOAD decode (MP1/MP2/MP3, AAC, Opus,
  * H.264) falls back to a clearly-marked deterministic stand-in. The
  * dividing line is where the codec's CONSTANTS live (SURVEY.md §2.15,
  * r13): FLAC carries its whole model in-stream (LPC + Rice — decoded
  * for real, [[FlacCodec]]); these formats bake committee-designed
  * tables into the spec (MPEG audio's 512-coefficient synthesis window
  * and bit-allocation tables, MP3/AAC Huffman codebooks, Opus VQ/range-
  * coder tables, H.264 CABAC contexts) that have no closed form —
  * re-inventing them would emit silently-wrong samples behind a
  * `decoded=true` flag, strictly worse than the labeled stand-in, so
  * real decode for them is the [[MediaCodecProvider]] seam's job.
  * Everything around
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
        // WAVE_FORMAT_EXTENSIBLE: the effective tag hides in the first
        // two bytes of the SubFormat GUID; the remaining 14 bytes must
        // be the fixed KSDATAFORMAT media-type suffix, else the payload
        // is some vendor type we must not misread as PCM
        if (fmtTag == 0xfffe && size >= 40 && i + 48 <= b.length) {
          val g = i + 32 // GUID offset: common 16 + cbSize 2 + valid 2 + mask 4
          val suffix = Array(0x00, 0x00, 0x00, 0x00, 0x10, 0x00, 0x80,
            0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71)
          if (suffix.indices.forall(k => (b(g + 2 + k) & 0xff) == suffix(k)))
            fmtTag = le16(b, g)
        }
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
        case (17, 4) => // IMA/DVI ADPCM: real compressed decode (r12)
          decodeImaAdpcm(b, rate, channels, dataOff, dataLen, w.blockAlign)
        case (2, 4) => // Microsoft ADPCM: real compressed decode (r12)
          decodeMsAdpcm(b, rate, channels, dataOff, dataLen, w.blockAlign)
        case _ => None // compressed tags the JVM can't expand unaided
      }
    }
  }

  /** 80-bit IEEE 754 extended float (big-endian) → double — AIFF's COMM
    * sample-rate encoding; the JVM has no extended type, so the sign /
    * 15-bit-exponent / explicit-integer-bit-mantissa unpack is by hand.
    * The two 32-bit mantissa halves combine in DOUBLE (each is exact
    * below 2³²) so the top bit never reads as a Long sign. */
  private def extended80(b: Array[Byte], off: Int): Double = {
    val se = be16(b, off)
    val sign = if ((se & 0x8000) != 0) -1.0 else 1.0
    val exp = se & 0x7fff
    val hi = be32(b, off + 2).toLong & 0xffffffffL
    val lo = be32(b, off + 6).toLong & 0xffffffffL
    val mant = hi.toDouble * 4294967296.0 + lo.toDouble
    if (exp == 0 && mant == 0.0) 0.0
    else sign * mant * math.pow(2.0, exp - 16383 - 63)
  }

  /** AIFF / AIFC sample decode — the big-endian cousin of the WAV walk:
    * FORM/AIFF chunk scan for COMM (channels, frames, bits, 80-bit
    * extended-float sample rate, AIFC compression fourcc) and SSND
    * (offset-prefixed sample data). Real expansion for the PCM family:
    * 16-bit big-endian, 8-bit SIGNED (unlike WAV's unsigned 8-bit), and
    * AIFC 'sowt' little-endian 16-bit. Same hardened posture as
    * [[walkWav]]: malformed sizes return None, never a thrown task. */
  private[functions] def decodeAiff(b: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    def tag(off: Int, s: String): Boolean =
      off + 4 <= b.length && s.indices.forall(i => b(off + i) == s.charAt(i))
    if (!(tag(0, "FORM") && (tag(8, "AIFF") || tag(8, "AIFC")))) return None
    var i = 12
    var channels = 0; var bits = 0; var rate = 0.0
    var comp = "NONE"
    var sndOff = -1; var sndLen = 0
    while (i + 8 <= b.length) {
      val size = be32(b, i + 4)
      if (size < 0) return None
      val p = i + 8
      if (tag(i, "COMM") && p + 18 <= b.length) {
        channels = be16(b, p)
        bits = be16(b, p + 6)
        rate = extended80(b, p + 8)
        if (tag(8, "AIFC") && size >= 22 && p + 22 <= b.length)
          comp = new String(b, p + 18, 4,
            java.nio.charset.StandardCharsets.US_ASCII)
      } else if (tag(i, "SSND") && p + 8 <= b.length) {
        val off0 = be32(b, p)
        if (off0 < 0) return None
        sndOff = p + 8 + off0
        sndLen = math.max(0, math.min(size - 8 - off0, b.length - sndOff))
      }
      val next = i.toLong + 8L + size.toLong + (size & 1) // word-aligned
      if (next > Int.MaxValue) return None
      i = next.toInt
    }
    // rate is attacker-controlled 80-bit float: NaN/Inf/2³²-scale
    // exponents must not round into a garbage Int rate
    if (channels <= 0 || sndOff < 0) return None
    if (rate.isNaN || rate < 1.0 || rate > Int.MaxValue.toDouble) return None
    val r = math.round(rate).toInt
    (comp, bits) match {
      case ("NONE" | "none", 16) =>
        val n = sndLen / 2
        Some((r, channels, Array.tabulate(n) { j =>
          be16(b, sndOff + 2 * j).toShort / 32768.0
        }))
      case ("NONE" | "none", 8) => // AIFF 8-bit PCM is SIGNED
        Some((r, channels, Array.tabulate(sndLen) { j =>
          b(sndOff + j) / 128.0
        }))
      case ("sowt", 16) => // AIFC byte-swapped (little-endian) 16-bit
        val n = sndLen / 2
        Some((r, channels, Array.tabulate(n) { j =>
          le16(b, sndOff + 2 * j).toShort / 32768.0
        }))
      case _ => None // compressed AIFC variants ride the provider seam
    }
  }

  // IMA ADPCM step/index tables (public DVI/IMA spec)
  private val ImaStep: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val ImaIndex: Array[Int] =
    Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** One IMA nibble → next predicted sample (mutating state via return).
    * Canonical IMA expansion: diff = step/8 (+step/1,2,4 per magnitude
    * bits), sign bit subtracts; predictor clamps to int16, index to
    * [0, 88]. */
  @inline private def imaStep(nib: Int, pred: Int, idx: Int): (Int, Int) = {
    val step = ImaStep(idx)
    var diff = step >> 3
    if ((nib & 4) != 0) diff += step
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 1) != 0) diff += step >> 2
    val p0 = if ((nib & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + ImaIndex(nib)))
    (p, i)
  }

  /** IMA/DVI ADPCM (WAV format tag 0x11, 4-bit) sample decode — 4×
    * compressed telephony/game audio, pure integer DSP like
    * [[FlacCodec]]. Block layout per the public Microsoft/IMA spec:
    * per-channel 4-byte block headers (int16 predictor = sample 0,
    * step index, reserved), then nibble data low-nibble-first —
    * mono sequential, stereo interleaved in 4-byte groups per channel.
    * Malformed geometry (blockAlign too small, odd channel counts)
    * returns None, never a thrown task. */
  private[functions] def decodeImaAdpcm(
      b: Array[Byte], rate: Int, channels: Int,
      dataOff: Int, dataLen: Int, blockAlign: Int): Option[(Int, Int, Array[Double])] = {
    if (channels < 1 || channels > 2) return None
    if (blockAlign < 4 * channels + 4 || blockAlign > dataLen) return None
    val samplesPerBlock = (blockAlign - 4 * channels) * 2 / channels + 1
    // stereo nibbles interleave in full 4-byte groups; a geometry that
    // leaves a partial group would index past the block on crafted input
    if (channels == 2 && (samplesPerBlock - 1) % 8 != 0) return None
    val blocks = dataLen / blockAlign
    if (blocks <= 0) return None
    val out = new Array[Double](blocks * samplesPerBlock * channels)
    var outAt = 0
    var blk = 0
    while (blk < blocks) {
      val base = dataOff + blk * blockAlign
      val pred = new Array[Int](channels)
      val idx = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        pred(c) = le16(b, base + 4 * c).toShort.toInt
        idx(c) = math.max(0, math.min(88, b(base + 4 * c + 2) & 0xff))
        out(outAt + c) = pred(c) / 32768.0 // header predictor IS sample 0
        c += 1
      }
      outAt += channels
      val dataStart = base + 4 * channels
      val nibblesPerChan = samplesPerBlock - 1
      var s = 0
      while (s < nibblesPerChan) {
        c = 0
        while (c < channels) {
          // mono: sequential bytes; stereo: 4-byte groups per channel
          val byteIdx =
            if (channels == 1) dataStart + (s >> 1)
            else dataStart + ((s >> 3) * 8 + c * 4) + ((s & 7) >> 1)
          val byte = b(byteIdx) & 0xff
          val nib = if ((s & 1) == 0) byte & 0x0f else (byte >> 4) & 0x0f
          val (p, i) = imaStep(nib, pred(c), idx(c))
          pred(c) = p; idx(c) = i
          out(outAt + c) = p / 32768.0
          c += 1
        }
        outAt += channels
        s += 1
      }
      blk += 1
    }
    Some((rate, channels, out))
  }

  // Microsoft ADPCM coefficient and adaptation tables (public WAVE spec)
  private val MsCoef1 = Array(256, 512, 0, 192, 240, 460, 392)
  private val MsCoef2 = Array(0, -256, 0, 64, 0, -208, -232)
  private val MsAdapt = Array(230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** Microsoft ADPCM (WAV format tag 0x02, 4-bit) sample decode — the
    * other ubiquitous WAV compression next to IMA (fmt 0x11), pure
    * integer DSP. Block layout per the public Microsoft WAVE spec:
    * per-channel headers of predictor-coefficient index (1 byte, 0–6
    * into the fixed [[MsCoef1]]/[[MsCoef2]] tables), int16 initial
    * delta, int16 sample1 (newer seed) and int16 sample2 (older seed) —
    * the two seeds lead the output, OLDER FIRST — then 4-bit nibbles
    * HIGH-nibble-first (opposite of IMA), channel-interleaved per
    * sample. Per nibble: predict from the two prior samples via the
    * fixed-point coefficient pair (>> 8), add signed-nibble × delta,
    * clamp to int16, then rescale delta by the adaptation table with a
    * floor of 16. Malformed geometry or an out-of-range predictor index
    * returns None, never a thrown task. */
  private[functions] def decodeMsAdpcm(
      b: Array[Byte], rate: Int, channels: Int,
      dataOff: Int, dataLen: Int, blockAlign: Int): Option[(Int, Int, Array[Double])] = {
    if (channels < 1 || channels > 2) return None
    if (blockAlign < 7 * channels || blockAlign > dataLen) return None
    val samplesPerBlock = (blockAlign - 7 * channels) * 2 / channels + 2
    val blocks = dataLen / blockAlign
    if (blocks <= 0) return None
    val out = new Array[Double](blocks * samplesPerBlock * channels)
    var outAt = 0
    var blk = 0
    while (blk < blocks) {
      val base = dataOff + blk * blockAlign
      val coef1 = new Array[Int](channels); val coef2 = new Array[Int](channels)
      val delta = new Array[Int](channels)
      val s1 = new Array[Int](channels); val s2 = new Array[Int](channels)
      var c = 0
      while (c < channels) {
        val p = b(base + c) & 0xff
        if (p > 6) return None // crafted predictor index would table-fault
        coef1(c) = MsCoef1(p); coef2(c) = MsCoef2(p)
        delta(c) = le16(b, base + channels + 2 * c).toShort.toInt
        s1(c) = le16(b, base + 3 * channels + 2 * c).toShort.toInt
        s2(c) = le16(b, base + 5 * channels + 2 * c).toShort.toInt
        c += 1
      }
      // the two seed samples lead the block, older (sample2) first
      c = 0; while (c < channels) { out(outAt + c) = s2(c) / 32768.0; c += 1 }
      outAt += channels
      c = 0; while (c < channels) { out(outAt + c) = s1(c) / 32768.0; c += 1 }
      outAt += channels
      val dataStart = base + 7 * channels
      val nibTotal = (blockAlign - 7 * channels) * 2
      var k = 0
      while (k < nibTotal) {
        val byte = b(dataStart + (k >> 1)) & 0xff
        val nib = if ((k & 1) == 0) (byte >> 4) & 0x0f else byte & 0x0f
        val ch = k % channels // stereo nibbles alternate L,R per sample
        val signed = if (nib >= 8) nib - 16 else nib
        // C-semantics division (truncate toward zero), NOT an arithmetic
        // shift: the spec's '/ 256' rounds -300 to -1 where >> 8 gives
        // -2, and the error would compound through the predictor
        val predicted =
          (s1(ch) * coef1(ch) + s2(ch) * coef2(ch)) / 256 + signed * delta(ch)
        val p = math.max(-32768, math.min(32767, predicted))
        s2(ch) = s1(ch); s1(ch) = p
        delta(ch) = math.max(16, MsAdapt(nib) * delta(ch) / 256)
        out(outAt) = p / 32768.0
        outAt += 1
        k += 1
      }
      blk += 1
    }
    Some((rate, channels, out))
  }

  private def be16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def be64(b: Array[Byte], off: Int): Long =
    ((be32(b, off).toLong & 0xffffffffL) << 32) |
      (be32(b, off + 4).toLong & 0xffffffffL)
  private def le64(b: Array[Byte], off: Int): Long =
    (le32(b, off).toLong & 0xffffffffL) |
      ((le32(b, off + 4).toLong & 0xffffffffL) << 32)

  /** Real MP4 (ISO BMFF) header metadata from a box-structure walk —
    * the same hand-parsed-container approach as the WAV/BMP walks
    * (VERDICT r6 next #7): only frame *payload* decode remains the
    * stand-in (the JVM ships no H.264/AAC codec). */
  final case class Mp4Info(
      majorBrand: String,
      timescale: Long,
      /** mvhd duration in milliseconds (0 if timescale missing). */
      durationMs: Long,
      trackCount: Int,
      /** First video track's tkhd dimensions (16.16 fixed → int). */
      width: Int,
      height: Int,
      /** Video track's stts sample count = frame count. */
      frames: Int,
      /** stsd sample-entry fourccs across tracks (e.g. avc1, mp4a). */
      codecs: Seq[String])

  /** ISO BMFF walk: boxes are [size:be32]["type":4][payload], size==1 →
    * 64-bit size follows, size==0 → to end; moov/trak/mdia/minf/stbl
    * nest. Reads mvhd (timescale+duration), per-trak tkhd (dims) +
    * hdlr (vide/soun) + stts (sample count) + stsd (codec fourccs).
    * Untrusted input: any size that escapes its enclosing box ends the
    * walk with what was parsed so far — never a thrown task. */
  def decodeMp4(b: Array[Byte]): Option[Mp4Info] = {
    def str(off: Int, n: Int): String =
      new String(b, off, n, java.nio.charset.StandardCharsets.US_ASCII)
    if (b.length < 12 || str(4, 4) != "ftyp") return None
    val brand = str(8, 4)
    var timescale = 0L; var duration = 0L
    var tracks = 0; var width = 0; var height = 0; var frames = 0
    val codecs = scala.collection.mutable.ArrayBuffer.empty[String]

    final class Trak {
      var video = false; var w = 0; var h = 0; var samples = 0
    }
    // Real files nest ≤ ~6 deep (moov/trak/mdia/minf/stbl); a crafted
    // payload of thousands of nested containers would otherwise drive
    // the recursion to StackOverflowError — which is NOT NonFatal, so it
    // would escape decode()'s Try and kill the task instead of degrading
    def walk(start: Long, end: Long, trak: Trak, depth: Int = 0): Unit = {
      if (depth > 16) return
      var i = start
      while (i + 8 <= end) {
        val size0 = be32(b, i.toInt).toLong & 0xffffffffL
        val typ = str(i.toInt + 4, 4)
        var hdr = 8L
        val size =
          if (size0 == 1 && i + 16 <= end) { hdr = 16L; be64(b, i.toInt + 8) }
          else if (size0 == 0) end - i
          else size0
        if (size < hdr || i + size > end) return // malformed: keep parsed
        val p = (i + hdr).toInt
        val boxEnd = i + size
        typ match {
          case "moov" | "mdia" | "minf" | "stbl" => walk(p, boxEnd, trak, depth + 1)
          case "trak" =>
            val t = new Trak
            walk(p, boxEnd, t, depth + 1)
            tracks += 1
            if (t.video && t.w > 0 && width == 0) {
              width = t.w; height = t.h; frames = t.samples
            }
          case "mvhd" if p + 4 <= boxEnd =>
            val v = b(p) & 0xff
            if (v == 1 && p + 32 <= boxEnd) {
              timescale = be32(b, p + 20).toLong & 0xffffffffL
              duration = be64(b, p + 24)
            } else if (v == 0 && p + 24 <= boxEnd) {
              timescale = be32(b, p + 12).toLong & 0xffffffffL
              duration = be32(b, p + 16).toLong & 0xffffffffL
            }
          case "tkhd" if trak != null && p + 4 <= boxEnd =>
            val v = b(p) & 0xff
            val dimOff = p + (if (v == 1) 88 else 76)
            if (dimOff + 8 <= boxEnd) {
              trak.w = be32(b, dimOff) >>> 16 // 16.16 fixed point
              trak.h = be32(b, dimOff + 4) >>> 16
            }
          case "hdlr" if trak != null && p + 12 <= boxEnd =>
            if (str(p + 8, 4) == "vide") trak.video = true
          case "stts" if trak != null && p + 8 <= boxEnd =>
            val entries = be32(b, p + 4)
            var k = 0; var total = 0L
            while (k < entries && p + 8 + 8 * k + 8 <= boxEnd) {
              total += be32(b, p + 8 + 8 * k).toLong & 0xffffffffL
              k += 1
            }
            trak.samples = math.min(total, Int.MaxValue.toLong).toInt
          case "stsd" if p + 8 <= boxEnd =>
            val entries = be32(b, p + 4)
            var off = p + 8; var k = 0
            while (k < entries && off + 8 <= boxEnd) {
              val esz = be32(b, off)
              if (esz < 8 || off + esz > boxEnd) { k = entries } // stop
              else { codecs += str(off + 4, 4); off += esz; k += 1 }
            }
          case _ => // leaf we don't read
        }
        i += size
      }
    }
    walk(0L, b.length.toLong, null)
    if (timescale > 0 || tracks > 0)
      Some(Mp4Info(brand, timescale,
        if (timescale > 0) duration * 1000L / timescale else 0L,
        tracks, width, height, frames, codecs.toSeq))
    else None
  }

  /** Ogg/Opus header metadata: page walk for the OpusHead packet
    * (channels, pre-skip) and the final granule position — duration in
    * 48 kHz samples is lastGranule − preSkip by the Opus-in-Ogg spec.
    * Packet (frame) decode stays the stand-in; the container metadata
    * is real. Returns (sampleRate=48000, channels, durationSamples). */
  def decodeOpusOgg(b: Array[Byte]): Option[(Int, Int, Long)] = {
    def tag(off: Int, s: String): Boolean =
      off + s.length <= b.length && s.indices.forall(i => b(off + i) == s.charAt(i))
    if (!tag(0, "OggS")) return None
    var channels = 0; var preSkip = 0; var found = false
    var lastGranule = 0L
    var i = 0
    while (i + 27 <= b.length && tag(i, "OggS")) {
      val granule = le64(b, i + 6)
      val nsegs = b(i + 26) & 0xff
      if (i + 27 + nsegs > b.length) return if (found) Some((48000, channels,
        math.max(0L, lastGranule - preSkip))) else None
      var plen = 0
      var k = 0
      while (k < nsegs) { plen += b(i + 27 + k) & 0xff; k += 1 }
      val dataOff = i + 27 + nsegs
      if (!found && dataOff + 12 <= b.length && tag(dataOff, "OpusHead")) {
        channels = b(dataOff + 9) & 0xff
        preSkip = le16(b, dataOff + 10)
        found = true
      }
      if (granule > 0) lastGranule = granule // -1 = no packet boundary
      i = dataOff + plen
    }
    if (found) Some((48000, channels, math.max(0L, lastGranule - preSkip)))
    else None
  }

  // MPEG audio bitrate tables in kbps, indexed [layer][bitrateIndex];
  // index 0 = "free format" (unsizeable here), 15 = invalid (public
  // ISO/IEC 11172-3 / 13818-3 tables)
  private val Mp3BitrateV1: Array[Array[Int]] = Array(
    null,
    Array(0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320, 352, 384, 416, 448),
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 384),
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320))
  private val Mp3BitrateV2: Array[Array[Int]] = Array(
    null,
    Array(0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176, 192, 224, 256),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160),
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160))
  private val Mp3RateV1 = Array(44100, 48000, 32000)

  /** MPEG audio (MP3 family) stream metadata from a frame-header walk. */
  final case class Mp3Info(
      /** 1 = MPEG-1, 2 = MPEG-2, 25 = MPEG-2.5. */
      version: Int,
      layer: Int,
      sampleRate: Int,
      channels: Int,
      frames: Int,
      durationMs: Long,
      /** Mean over per-frame header bitrates (exact for CBR). */
      avgBitrateKbps: Int,
      /** True when frame bitrates vary or a "Xing" VBR tag is present. */
      vbr: Boolean) {
    /** Exact per-channel PCM samples per frame (ISO frame sizes). */
    def samplesPerFrame: Int = layer match {
      case 1 => 384
      case 2 => 1152
      case _ => if (version == 1) 1152 else 576
    }
    /** Exact per-channel sample count — never the lossy duration
      * round-trip (two floor divisions can drop ~rate/1000 samples). */
    def totalSamples: Long = frames.toLong * samplesPerFrame
  }

  /** Real MPEG audio (MP3/MP2/MP1) metadata from a frame-header walk —
    * the same hand-parsed-container posture as [[decodeMp4]] /
    * [[decodeOpusOgg]]: sync on 11 set bits, read version/layer/bitrate/
    * samplerate/channel-mode from the 4-byte header, size each frame
    * from the public ISO formula (144·bitrate/rate + padding for
    * Layer III, halved slot coefficient for MPEG-2/2.5) and step
    * frame-to-frame, requiring ≥2 consecutive consistent headers so
    * arbitrary bytes with a lucky sync don't parse. Skips a leading
    * ID3v2 tag (syncsafe size). Reads the Xing/Info VBR header at the
    * version/mode-dependent side-info offset in the first frame. Frame
    * *payload* decode (Huffman + IMDCT) stays behind the
    * [[MediaCodecProvider]] seam. Malformed input → None or the frames
    * parsed so far, never a thrown task. */
  def decodeMp3(b: Array[Byte]): Option[Mp3Info] = {
    var i = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      val skip = 10L + sz
      if (skip + 4 > b.length) return None
      i = skip.toInt
    }
    // (version, layer, sampleRate, channels, bitrateKbps, frameBytes)
    def header(off: Int): Option[(Int, Int, Int, Int, Int, Int)] = {
      if (off + 4 > b.length) return None
      val h0 = b(off) & 0xff; val h1 = b(off + 1) & 0xff
      val h2 = b(off + 2) & 0xff; val h3 = b(off + 3) & 0xff
      if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
      val verBits = (h1 >> 3) & 3 // 0=2.5, 1=reserved, 2=MPEG2, 3=MPEG1
      val layerBits = (h1 >> 1) & 3 // 0=reserved, 1=III, 2=II, 3=I
      if (verBits == 1 || layerBits == 0) return None
      val version = verBits match { case 3 => 1; case 2 => 2; case _ => 25 }
      val layer = 4 - layerBits
      val brIdx = (h2 >> 4) & 0x0f
      val srIdx = (h2 >> 2) & 3
      if (brIdx == 0 || brIdx == 15 || srIdx == 3) return None // free/invalid
      val kbps =
        (if (version == 1) Mp3BitrateV1 else Mp3BitrateV2)(layer)(brIdx)
      val rate = Mp3RateV1(srIdx) / (version match {
        case 1 => 1; case 2 => 2; case _ => 4
      })
      val padding = (h2 >> 1) & 1
      val channels = if (((h3 >> 6) & 3) == 3) 1 else 2
      val frameBytes = layer match {
        case 1 => (12 * kbps * 1000 / rate + padding) * 4
        case 2 => 144 * kbps * 1000 / rate + padding
        case _ => // Layer III: MPEG-2/2.5 frames carry half the slots
          (if (version == 1) 144 else 72) * kbps * 1000 / rate + padding
      }
      Some((version, layer, rate, channels, kbps, frameBytes))
    }
    val first = header(i).getOrElse(return None)
    val (version, layer, rate, channels0, _, _) = first
    var frames = 0; var kbpsSum = 0L; var vbr = false
    var channels = channels0
    var at = i
    var go = true
    while (go) {
      header(at) match {
        case Some((v, l, r, c, kbps, len)) if v == version && l == layer && r == rate =>
          frames += 1; kbpsSum += kbps; channels = c
          if (kbps != first._5) vbr = true
          if (frames == 1) { // Xing/Info VBR header after the side info
            val side =
              if (version == 1) { if (c == 1) 17 else 32 }
              else { if (c == 1) 9 else 17 }
            // protection_bit = 0 means a 16-bit CRC sits between the
            // header and the side info, shifting the Xing offset
            val crc = if ((b(at + 1) & 1) == 0) 2 else 0
            val x = at + 4 + crc + side
            if (x + 8 <= b.length && b(x) == 'X' && b(x + 1) == 'i' &&
                b(x + 2) == 'n' && b(x + 3) == 'g') vbr = true
          }
          at += len
        case _ => go = false // trailing garbage/ID3v1: keep parsed frames
      }
    }
    // a lone "frame" is indistinguishable from a lucky sync in noise
    if (frames < 2) return None
    val info = Mp3Info(version, layer, rate, channels, frames, 0L,
      math.round(kbpsSum.toDouble / frames).toInt, vbr)
    Some(info.copy(durationMs = info.totalSamples * 1000L / rate))
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

  /** Decode: real for BMP/WAV (hand-parsed headers), JPEG/PNG/GIF
    * (JDK ImageIO), and MP4 video metadata (box walk: tkhd dims + stts
    * frame count); then any registered [[MediaCodecProvider]] (the
    * compressed-codec seam — an FFmpeg/JNI jar on the executor
    * classpath handles what the JVM cannot); STUB fallback
    * (deterministic fake in place of a codec call) only when no parser
    * and no provider claims the payload. */
  private[functions] def decode(kind: String, payload: Array[Byte]): (Int, Int, Int) =
    // Try: any malformed container that still escapes the parsers'
    // structural checks degrades to the stand-in like unknown formats do
    scala.util.Try(decodeBmp(payload).orElse(decodeWav(payload))
        .orElse(decodeImage(payload))
        .orElse(decodeMp4(payload).collect {
          case m if m.width > 0 => (m.width, m.height, math.max(m.frames, 1))
        }))
      .toOption.flatten
      // provider seam OUTSIDE the Try, matching the audio path: a
      // built-in parser throwing on a malformed container must not
      // skip registered codec providers (MediaCodecs.first already
      // swallows provider exceptions)
      .orElse(MediaCodecs.video(payload))
      .getOrElse {
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
        scala.util.Try(decodeAudio(r.payload)).toOption.flatten
          // AIFF/AIFC: real big-endian PCM decode (r12)
          .orElse(scala.util.Try(decodeAiff(r.payload)).toOption.flatten)
          // FLAC: real pure-JVM compressed decode (Rice + LPC integer
          // DSP needs nothing the JVM lacks); never throws
          .orElse(FlacCodec.decode(r.payload))
          // remaining compressed payloads (AAC/Opus/…): the provider
          // seam — real decode when a codec jar is deployed, else fall
          // through to the labeled stand-in below
          .orElse(MediaCodecs.audio(r.payload)) match {
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
            // Ogg/Opus and MP3 payloads: rate/channels/duration come
            // from the REAL container walk even though sample decode
            // stays the stand-in (decoded=false means exactly that)
            scala.util.Try(decodeOpusOgg(r.payload)).toOption.flatten
              .map { case (rate, channels, nSamples) =>
                (rate, channels, math.min(nSamples, Int.MaxValue.toLong).toInt)
              }
              .orElse(scala.util.Try(decodeMp3(r.payload)).toOption.flatten
                .map(m => (m.sampleRate, m.channels,
                  math.min(m.totalSamples, Int.MaxValue.toLong).toInt))) match {
              case Some((rate, channels, nSamples)) =>
                AudioFeature(r.media_id, decoded = false, rate, channels,
                  nSamples, rms, peak)
              case None =>
                AudioFeature(r.media_id, decoded = false, 0, 0,
                  r.payload.length, rms, peak)
            }
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
