package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Microsoft ADPCM decode tests: a reference test-side encoder
  * compresses a waveform with the canonical MS-ADPCM algorithm; the
  * decoder must reproduce the ENCODER'S reconstruction exactly (lossy
  * against the original signal, but encoder and decoder track the same
  * predictor state, so their sample streams must be bit-identical). */
class MsAdpcmSpec extends AnyFunSuite {

  private val Coef1 = Array(256, 512, 0, 192, 240, 460, 392)
  private val Coef2 = Array(0, -256, 0, 64, 0, -208, -232)
  private val Adapt = Array(230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230)

  /** Canonical MS-ADPCM encoder step: quantize (target − prediction)
    * by the current delta, clamp to a signed nibble, return
    * (nibble, reconstructed sample, next delta) using decoder-identical
    * arithmetic. */
  private def encodeStep(target: Int, s1: Int, s2: Int, c1: Int, c2: Int,
      delta: Int): (Int, Int, Int) = {
    val predicted = (s1 * c1 + s2 * c2) / 256 // C truncation, not >> 8
    val signed = math.max(-8, math.min(7, (target - predicted) / delta))
    val nib = signed & 0x0f
    val p = math.max(-32768, math.min(32767, predicted + signed * delta))
    val d = math.max(16, Adapt(nib) * delta / 256)
    (nib, p, d)
  }

  private def le16(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)

  /** Encode `signal` (per-channel arrays) into a WAV/MS-ADPCM payload
    * using `preds(c)` as channel c's coefficient-set index; returns
    * (payload, expected reconstruction per channel). */
  private def encode(rate: Int, signal: Array[Array[Int]], blockAlign: Int,
      preds: Array[Int]): (Array[Byte], Array[Array[Int]]) = {
    val channels = signal.length
    val n = signal(0).length
    val samplesPerBlock = (blockAlign - 7 * channels) * 2 / channels + 2
    require(n % samplesPerBlock == 0, "test signal must fill whole blocks")
    val recon = Array.fill(channels)(new Array[Int](n))
    val data = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var blk0 = 0
    while (blk0 < n) {
      val c1 = preds.map(Coef1)
      val c2 = preds.map(Coef2)
      val delta = Array.fill(channels)(500)
      val s2 = Array.tabulate(channels)(c => signal(c)(blk0))     // older
      val s1 = Array.tabulate(channels)(c => signal(c)(blk0 + 1)) // newer
      for (c <- 0 until channels) {
        recon(c)(blk0) = s2(c); recon(c)(blk0 + 1) = s1(c)
        data += preds(c).toByte
      }
      for (c <- 0 until channels) data ++= le16(delta(c))
      for (c <- 0 until channels) data ++= le16(s1(c))
      for (c <- 0 until channels) data ++= le16(s2(c))
      val nibbles = scala.collection.mutable.ArrayBuffer.empty[Int]
      for (s <- 2 until samplesPerBlock; c <- 0 until channels) {
        val (nib, p, d) =
          encodeStep(signal(c)(blk0 + s), s1(c), s2(c), c1(c), c2(c), delta(c))
        s2(c) = s1(c); s1(c) = p; delta(c) = d
        recon(c)(blk0 + s) = p
        nibbles += nib
      }
      nibbles.grouped(2).foreach { g => // HIGH nibble first (unlike IMA)
        val hi = g.head; val lo = if (g.size > 1) g(1) else 0
        data += ((hi << 4) | lo).toByte
      }
      blk0 += samplesPerBlock
    }
    val hdr = scala.collection.mutable.ArrayBuffer.empty[Byte]
    hdr ++= "RIFF".getBytes; hdr ++= le32(36 + data.size)
    hdr ++= "WAVE".getBytes
    hdr ++= "fmt ".getBytes; hdr ++= le32(16)
    hdr ++= le16(2) // WAVE_FORMAT_ADPCM
    hdr ++= le16(channels); hdr ++= le32(rate)
    hdr ++= le32(rate * blockAlign / samplesPerBlock) // nominal byte rate
    hdr ++= le16(blockAlign); hdr ++= le16(4) // bits per sample
    hdr ++= "data".getBytes; hdr ++= le32(data.size)
    ((hdr ++ data).toArray, recon)
  }

  test("mono MS ADPCM round-trips the encoder's reconstruction exactly") {
    val spb = (256 - 7) * 2 + 2 // 500 samples per block at blockAlign 256
    val n = spb * 2
    val sig = Array.tabulate(n)(i =>
      (9000 * math.sin(i / 6.0) + 1500 * math.sin(i / 2.1)).toInt)
    val (payload, recon) = encode(8000, Array(sig), 256, Array(0))
    val Some((rate, channels, samples)) =
      Multimodal.decodeAudio(payload): @unchecked
    assert(rate == 8000 && channels == 1 && samples.length == n)
    for (i <- 0 until n)
      assert(samples(i) == recon(0)(i) / 32768.0, s"sample $i")
  }

  test("stereo MS ADPCM alternates channel nibbles, distinct coefficient sets") {
    val spb = (256 - 14) * 2 / 2 + 2 // 244 samples per block
    val n = spb
    val l = Array.tabulate(n)(i => (7000 * math.sin(i / 4.0)).toInt)
    val r = Array.tabulate(n)(i => (5000 * math.cos(i / 8.0)).toInt)
    // different predictors per channel exercise the coefficient table
    val (payload, recon) = encode(16000, Array(l, r), 256, Array(4, 1))
    val Some((rate, channels, samples)) =
      Multimodal.decodeAudio(payload): @unchecked
    assert(rate == 16000 && channels == 2 && samples.length == 2 * n)
    for (i <- 0 until n) {
      assert(samples(2 * i) == recon(0)(i) / 32768.0, s"L $i")
      assert(samples(2 * i + 1) == recon(1)(i) / 32768.0, s"R $i")
    }
  }

  test("out-of-range predictor index returns None, never throws") {
    val spb = (256 - 7) * 2 + 2
    val (payload, _) = encode(8000, Array(Array.fill(spb)(0)), 256, Array(0))
    val bad = payload.clone()
    // first data byte (predictor index) is right after the 44-byte header
    bad(44) = 7
    assert(Multimodal.decodeAudio(bad).isEmpty)
  }
}
