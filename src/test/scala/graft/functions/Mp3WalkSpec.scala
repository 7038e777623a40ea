package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** MP3 frame-header walk tests over synthetic MPEG audio streams built
  * from the public ISO header layout: the walk must recover version,
  * layer, sample rate, channels, frame count, duration and mean
  * bitrate, skip ID3v2, flag VBR, and reject noise with a lucky sync. */
class Mp3WalkSpec extends AnyFunSuite {

  // (bitrateKbps → index) for MPEG-1 Layer III
  private val V1L3 = Map(32 -> 1, 40 -> 2, 48 -> 3, 56 -> 4, 64 -> 5,
    80 -> 6, 96 -> 7, 112 -> 8, 128 -> 9, 160 -> 10, 192 -> 11,
    224 -> 12, 256 -> 13, 320 -> 14)
  // MPEG-2 Layer III
  private val V2L3 = Map(8 -> 1, 16 -> 2, 24 -> 3, 32 -> 4, 40 -> 5,
    48 -> 6, 56 -> 7, 64 -> 8, 80 -> 9, 96 -> 10, 112 -> 11, 128 -> 12,
    144 -> 13, 160 -> 14)

  /** One Layer III frame: 4-byte header + zero payload sized by the ISO
    * formula. mpeg1=false → MPEG-2. srIdx picks 44100/48000/32000 (÷2
    * for MPEG-2). mono → channel mode 11. */
  private def frame(mpeg1: Boolean, kbps: Int, srIdx: Int,
      mono: Boolean): Array[Byte] = {
    val rate = Array(44100, 48000, 32000)(srIdx) / (if (mpeg1) 1 else 2)
    val coef = if (mpeg1) 144 else 72
    val len = coef * kbps * 1000 / rate
    val brIdx = (if (mpeg1) V1L3 else V2L3)(kbps)
    val out = new Array[Byte](len)
    out(0) = 0xff.toByte
    // ver bits, Layer III, protection_bit = 1 (no CRC)
    out(1) = (0xe0 | (if (mpeg1) 3 else 2) << 3 | 1 << 1 | 1).toByte
    out(2) = ((brIdx << 4) | (srIdx << 2)).toByte                // no padding
    out(3) = (if (mono) 0xc0 else 0x00).toByte
    out
  }

  test("CBR MPEG-1 Layer III stereo: frames, duration, bitrate, no VBR") {
    val n = 40
    val payload = Array.fill(n)(frame(mpeg1 = true, 128, 0, mono = false))
      .flatten
    val Some(m) = Multimodal.decodeMp3(payload): @unchecked
    assert(m.version == 1 && m.layer == 3)
    assert(m.sampleRate == 44100 && m.channels == 2)
    assert(m.frames == n && !m.vbr)
    assert(m.avgBitrateKbps == 128)
    assert(m.durationMs == n.toLong * 1152 * 1000 / 44100)
  }

  test("ID3v2 tag is skipped via its syncsafe size") {
    val tagBody = 321
    val id3 = new Array[Byte](10 + tagBody)
    id3(0) = 'I'; id3(1) = 'D'; id3(2) = '3'; id3(3) = 4
    id3(8) = ((tagBody >> 7) & 0x7f).toByte
    id3(9) = (tagBody & 0x7f).toByte
    val payload = id3 ++
      Array.fill(8)(frame(mpeg1 = true, 192, 1, mono = false)).flatten
    val Some(m) = Multimodal.decodeMp3(payload): @unchecked
    assert(m.sampleRate == 48000 && m.frames == 8 && m.avgBitrateKbps == 192)
  }

  test("varying frame bitrates mark VBR and average exactly") {
    val payload = (Seq.fill(5)(128) ++ Seq.fill(5)(64))
      .map(k => frame(mpeg1 = true, k, 0, mono = false))
      .reduce(_ ++ _)
    val Some(m) = Multimodal.decodeMp3(payload): @unchecked
    assert(m.vbr && m.frames == 10 && m.avgBitrateKbps == 96)
  }

  test("MPEG-2 mono Layer III uses halved rate and 576-sample frames") {
    val n = 20
    val payload = Array.fill(n)(frame(mpeg1 = false, 64, 0, mono = true))
      .flatten
    val Some(m) = Multimodal.decodeMp3(payload): @unchecked
    assert(m.version == 2 && m.sampleRate == 22050 && m.channels == 1)
    assert(m.frames == n)
    assert(m.durationMs == n.toLong * 576 * 1000 / 22050)
  }

  test("Xing tag at the MPEG-1 stereo side-info offset marks VBR") {
    val frames = Array.fill(6)(frame(mpeg1 = true, 128, 0, mono = false))
    // Xing lives after 32 bytes of side info in an MPEG-1 stereo frame
    val x = 4 + 32
    frames(0)(x) = 'X'; frames(0)(x + 1) = 'i'
    frames(0)(x + 2) = 'n'; frames(0)(x + 3) = 'g'
    val Some(m) = Multimodal.decodeMp3(frames.flatten): @unchecked
    assert(m.vbr && m.avgBitrateKbps == 128) // CBR headers, VBR by tag
  }

  test("Xing detection honors the CRC-protected side-info shift") {
    // protection_bit = 0 → 16-bit CRC between header and side info
    val frames = Array.fill(6)(frame(mpeg1 = true, 128, 0, mono = false))
    frames(0)(1) = (frames(0)(1) & 0xfe).toByte // clear protection bit
    val x = 4 + 2 + 32 // header + CRC + MPEG-1 stereo side info
    frames(0)(x) = 'X'; frames(0)(x + 1) = 'i'
    frames(0)(x + 2) = 'n'; frames(0)(x + 3) = 'g'
    val Some(m) = Multimodal.decodeMp3(frames.flatten): @unchecked
    assert(m.vbr, "CRC shift must not hide the Xing tag")
    // and without the CRC bit the same offset must NOT match
    val noCrc = Array.fill(6)(frame(mpeg1 = true, 128, 0, mono = false))
    noCrc(0)(x) = 'X'; noCrc(0)(x + 1) = 'i'
    noCrc(0)(x + 2) = 'n'; noCrc(0)(x + 3) = 'g'
    val Some(m2) = Multimodal.decodeMp3(noCrc.flatten): @unchecked
    assert(!m2.vbr)
  }

  test("exact sample count comes from frames, not the duration round-trip") {
    val n = 40
    val payload = Array.fill(n)(frame(mpeg1 = true, 128, 0, mono = false))
      .flatten
    val Some(m) = Multimodal.decodeMp3(payload): @unchecked
    assert(m.totalSamples == n.toLong * 1152) // 46080, not 46040
    assert(m.durationMs * m.sampleRate / 1000L < m.totalSamples,
      "the round-trip this guards against would undercount")
  }

  test("a lone lucky sync in noise does not parse; trailing garbage kept") {
    // one valid header followed by noise that breaks the second header
    val one = frame(mpeg1 = true, 128, 0, mono = false)
    assert(Multimodal.decodeMp3(one ++ Array.fill(50)(0x55.toByte)).isEmpty)
    // two frames then garbage: the two frames are kept
    val two = one ++ one ++ Array.fill(33)(0x7e.toByte)
    val Some(m) = Multimodal.decodeMp3(two): @unchecked
    assert(m.frames == 2)
  }
}
