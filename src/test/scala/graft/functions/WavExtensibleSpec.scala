package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** WAVE_FORMAT_EXTENSIBLE (0xFFFE) tests: the real format tag rides in
  * the SubFormat GUID's first two bytes; the fixed KSDATAFORMAT suffix
  * gates the indirection so vendor GUIDs never misread as PCM. */
class WavExtensibleSpec extends AnyFunSuite {

  private def le16(v: Int): Seq[Byte] =
    Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Int): Seq[Byte] =
    Seq(v, v >> 8, v >> 16, v >> 24).map(x => (x & 0xff).toByte)

  private val ksSuffix: Seq[Byte] = Seq(0x00, 0x00, 0x00, 0x00, 0x10, 0x00,
    0x80, 0x00, 0x00, 0xaa, 0x00, 0x38, 0x9b, 0x71).map(_.toByte)

  private def extensibleWav(subTag: Int, samples: Seq[Int],
      breakGuid: Boolean = false): Array[Byte] = {
    val data = samples.flatMap(le16)
    val guid = le16(subTag) ++
      (if (breakGuid) ksSuffix.updated(10, 0x39.toByte) else ksSuffix)
    val fmt = le16(0xfffe) ++ le16(1) ++ le32(8000) ++ le32(16000) ++
      le16(2) ++ le16(16) ++ le16(22) ++ le16(16) ++ le32(4) ++ guid
    val out = scala.collection.mutable.ArrayBuffer.empty[Byte]
    out ++= "RIFF".getBytes; out ++= le32(4 + 8 + fmt.length + 8 + data.length)
    out ++= "WAVE".getBytes
    out ++= "fmt ".getBytes; out ++= le32(fmt.length); out ++= fmt
    out ++= "data".getBytes; out ++= le32(data.length); out ++= data
    out.toArray
  }

  test("extensible PCM resolves through the SubFormat GUID and decodes") {
    val xs = Seq(0, 2500, -2500, 32767, -32768)
    val Some((rate, ch, out)) =
      Multimodal.decodeAudio(extensibleWav(1, xs)): @unchecked
    assert(rate == 8000 && ch == 1)
    assert(out.toSeq == xs.map(s => s.toShort / 32768.0))
  }

  test("a vendor GUID (wrong suffix) is NOT misread as PCM") {
    val xs = Seq(0, 1000)
    assert(Multimodal.decodeAudio(
      extensibleWav(1, xs, breakGuid = true)).isEmpty)
  }
}
