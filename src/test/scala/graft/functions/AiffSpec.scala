package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** AIFF/AIFC decode tests over hand-built containers: 16-bit big-endian
  * PCM, 8-bit signed PCM, AIFC 'sowt' byte-swapped PCM, the 80-bit
  * extended-float sample rate, and malformed-geometry rejection. */
class AiffSpec extends AnyFunSuite {

  private def be16(v: Int): Seq[Byte] =
    Seq(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Int): Seq[Byte] =
    Seq(v >> 24, v >> 16, v >> 8, v).map(x => (x & 0xff).toByte)

  /** Integer sample rate → 80-bit extended big-endian (normalized:
    * mantissa's explicit integer bit at bit 63). */
  private def ext80(rate: Long): Seq[Byte] = {
    val top = 63 - java.lang.Long.numberOfLeadingZeros(rate)
    val exp = 16383 + top
    val mant = rate << (63 - top)
    be16(exp) ++ be32((mant >>> 32).toInt) ++ be32(mant.toInt)
  }

  private def aiff(form: String, comp: Option[String], channels: Int,
      bits: Int, rate: Long, snd: Seq[Byte]): Array[Byte] = {
    val comm = be16(channels) ++ be32(snd.length / channels / (bits / 8)) ++
      be16(bits) ++ ext80(rate) ++
      comp.map(_.getBytes.toSeq).getOrElse(Seq.empty)
    val ssnd = be32(0) ++ be32(0) ++ snd
    val body = "COMM".getBytes.toSeq ++ be32(comm.length) ++ comm ++
      (if (comm.length % 2 == 1) Seq(0.toByte) else Seq.empty) ++
      "SSND".getBytes.toSeq ++ be32(ssnd.length) ++ ssnd
    ("FORM".getBytes.toSeq ++ be32(4 + body.length) ++
      form.getBytes.toSeq ++ body).toArray
  }

  test("16-bit big-endian AIFF round-trips samples and the 80-bit rate") {
    val xs = Seq(0, 1000, -1000, 32767, -32768, 12345, -12345)
    val snd = xs.flatMap(be16)
    val Some((rate, ch, out)) =
      Multimodal.decodeAiff(aiff("AIFF", None, 1, 16, 44100L, snd)): @unchecked
    assert(rate == 44100 && ch == 1)
    assert(out.toSeq == xs.map(_ / 32768.0))
  }

  test("8-bit AIFF PCM is signed, unlike WAV's unsigned 8-bit") {
    val xs = Seq[Byte](0, 100, -100, 127, -128)
    val Some((rate, ch, out)) =
      Multimodal.decodeAiff(aiff("AIFF", None, 1, 8, 8000L, xs)): @unchecked
    assert(rate == 8000 && ch == 1)
    assert(out.toSeq == xs.map(_ / 128.0))
  }

  test("AIFC 'sowt' decodes little-endian 16-bit; stereo interleave kept") {
    val xs = Seq(500, -500, 20000, -20000)
    val snd = xs.flatMap(v => Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte))
    val Some((rate, ch, out)) =
      Multimodal.decodeAiff(aiff("AIFC", Some("sowt"), 2, 16, 48000L, snd)): @unchecked
    assert(rate == 48000 && ch == 2)
    assert(out.toSeq == xs.map(_ / 32768.0))
  }

  test("non-finite or overflowing 80-bit rates are rejected, not rounded") {
    val snd = Seq(0, 0).flatMap(be16)
    def withRate(raw: Seq[Byte]): Array[Byte] = {
      val ok = aiff("AIFF", None, 1, 16, 44100L, snd)
      // COMM payload rate field: FORM(12) + "COMM"+size(8) + ch/frames/bits(8)
      raw.zipWithIndex.foreach { case (v, k) => ok(28 + k) = v }
      ok
    }
    val inf = be16(0x7fff) ++ be32(0x80000000) ++ be32(0)
    assert(Multimodal.decodeAiff(withRate(inf)).isEmpty, "Inf rate")
    val nan = be16(0x7fff) ++ be32(0) ++ be32(0)
    assert(Multimodal.decodeAiff(withRate(nan)).isEmpty, "NaN rate")
    val huge = ext80(1L << 34) // > Int.MaxValue
    assert(Multimodal.decodeAiff(withRate(huge)).isEmpty, "2^34 rate")
  }

  test("unknown AIFC compression and malformed sizes return None") {
    val snd = Seq(0, 0).flatMap(be16)
    assert(Multimodal.decodeAiff(
      aiff("AIFC", Some("ima4"), 1, 16, 22050L, snd)).isEmpty)
    val ok = aiff("AIFF", None, 1, 16, 44100L, snd)
    val bad = ok.clone()
    bad(16) = 0xff.toByte // COMM size hugely wrong → structural bail
    assert(Multimodal.decodeAiff(bad).isEmpty)
    assert(Multimodal.decodeAiff("FORMxxxxAIFF".getBytes).isEmpty)
  }
}
