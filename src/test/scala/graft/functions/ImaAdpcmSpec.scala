package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** IMA/DVI ADPCM decode tests: a reference test-side encoder compresses
  * a waveform with the canonical IMA algorithm; the decoder must
  * reproduce the ENCODER'S reconstruction exactly (ADPCM is lossy
  * against the original signal, but encoder and decoder track the same
  * predictor state, so their sample streams must be bit-identical). */
class ImaAdpcmSpec extends AnyFunSuite {

  private val Step = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)
  private val Index = Array(-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)

  /** Canonical IMA encoder step: pick the nibble for (target − pred),
    * return (nibble, newPred, newIndex) using decoder-identical
    * reconstruction. */
  private def encodeStep(target: Int, pred: Int, idx: Int): (Int, Int, Int) = {
    val step = Step(idx)
    var delta = target - pred
    var nib = 0
    if (delta < 0) { nib = 8; delta = -delta }
    if (delta >= step) { nib |= 4; delta -= step }
    if (delta >= (step >> 1)) { nib |= 2; delta -= step >> 1 }
    if (delta >= (step >> 2)) { nib |= 1 }
    // decoder-identical reconstruction
    var diff = step >> 3
    if ((nib & 4) != 0) diff += step
    if ((nib & 2) != 0) diff += step >> 1
    if ((nib & 1) != 0) diff += step >> 2
    val p0 = if ((nib & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, idx + Index(nib)))
    (nib, p, i)
  }

  private def le16(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)

  /** Encode `signal` (per-channel arrays) into a WAV/IMA-ADPCM payload;
    * returns (payload, expected reconstruction per channel). */
  private def encode(rate: Int, signal: Array[Array[Int]], blockAlign: Int)
      : (Array[Byte], Array[Array[Int]]) = {
    val channels = signal.length
    val n = signal(0).length
    val samplesPerBlock = (blockAlign - 4 * channels) * 2 / channels + 1
    require(n % samplesPerBlock == 0, "test signal must fill whole blocks")
    val recon = Array.fill(channels)(new Array[Int](n))
    val data = scala.collection.mutable.ArrayBuffer.empty[Byte]
    var s0 = 0
    val idx = new Array[Int](channels)
    while (s0 < n) {
      val pred = new Array[Int](channels)
      for (c <- 0 until channels) {
        pred(c) = signal(c)(s0)
        recon(c)(s0) = pred(c)
        data ++= le16(pred(c))
        data += idx(c).toByte
        data += 0.toByte
      }
      val nibbles = Array.fill(channels)(
        scala.collection.mutable.ArrayBuffer.empty[Int])
      for (s <- 1 until samplesPerBlock; c <- 0 until channels) {
        val (nib, p, i) = encodeStep(signal(c)(s0 + s), pred(c), idx(c))
        pred(c) = p; idx(c) = i
        recon(c)(s0 + s) = p
        nibbles(c) += nib
      }
      if (channels == 1) {
        nibbles(0).grouped(2).foreach { g =>
          val lo = g.head; val hi = if (g.size > 1) g(1) else 0
          data += ((hi << 4) | lo).toByte
        }
      } else { // stereo: 8-nibble (4-byte) groups per channel, interleaved
        nibbles(0).indices.grouped(8).foreach { g =>
          for (c <- 0 until channels; k <- 0 until 4) {
            val a = g.head + 2 * k
            val lo = if (a < nibbles(c).size) nibbles(c)(a) else 0
            val hi = if (a + 1 < nibbles(c).size) nibbles(c)(a + 1) else 0
            data += ((hi << 4) | lo).toByte
          }
        }
      }
      s0 += samplesPerBlock
    }
    val hdr = scala.collection.mutable.ArrayBuffer.empty[Byte]
    hdr ++= "RIFF".getBytes; hdr ++= le32(36 + data.size)
    hdr ++= "WAVE".getBytes
    hdr ++= "fmt ".getBytes; hdr ++= le32(16)
    hdr ++= le16(17) // WAVE_FORMAT_IMA_ADPCM
    hdr ++= le16(channels); hdr ++= le32(rate)
    hdr ++= le32(rate * blockAlign / samplesPerBlock) // nominal byte rate
    hdr ++= le16(blockAlign); hdr ++= le16(4) // bits per sample
    hdr ++= "data".getBytes; hdr ++= le32(data.size)
    ((hdr ++ data).toArray, recon)
  }

  test("mono IMA ADPCM round-trips the encoder's reconstruction exactly") {
    val n = 505 * 2 // two blocks at blockAlign 256 → 505 samples/block
    val sig = Array.tabulate(n)(i =>
      (8000 * math.sin(i / 7.0) + 2000 * math.sin(i / 2.3)).toInt)
    val (payload, recon) = encode(8000, Array(sig), 256)
    val Some((rate, channels, samples)) =
      Multimodal.decodeAudio(payload): @unchecked
    assert(rate == 8000 && channels == 1 && samples.length == n)
    for (i <- 0 until n)
      assert(samples(i) == recon(0)(i) / 32768.0, s"sample $i")
  }

  test("stereo IMA ADPCM interleaves 4-byte groups per channel") {
    val spb = (256 - 8) * 2 / 2 + 1 // 249 samples per block
    val n = spb
    val l = Array.tabulate(n)(i => (6000 * math.sin(i / 5.0)).toInt)
    val r = Array.tabulate(n)(i => (4000 * math.cos(i / 9.0)).toInt)
    val (payload, recon) = encode(16000, Array(l, r), 256)
    val Some((rate, channels, samples)) =
      Multimodal.decodeAudio(payload): @unchecked
    assert(rate == 16000 && channels == 2 && samples.length == 2 * n)
    for (i <- 0 until n) {
      assert(samples(2 * i) == recon(0)(i) / 32768.0, s"L $i")
      assert(samples(2 * i + 1) == recon(1)(i) / 32768.0, s"R $i")
    }
  }

  test("malformed ADPCM geometry returns None, never throws") {
    val (payload, _) = encode(8000, Array(Array.fill(505)(0)), 256)
    // blockAlign smaller than one header
    val bad = payload.clone()
    // fmt blockAlign field is at offset 32 (RIFF 12 + fmt hdr 8 + 12)
    bad(32) = 2; bad(33) = 0
    assert(Multimodal.decodeAudio(bad).isEmpty)
  }
}
