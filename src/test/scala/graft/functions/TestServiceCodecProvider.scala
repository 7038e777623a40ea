package graft.functions

/** ServiceLoader-discovered test codec (the X6 seam's deployment path):
  * claims only payloads carrying the `GRAFTC1A` (audio) / `GRAFTC1V`
  * (video) magic — a stand-in for the format sniff a real FFmpeg/JNI
  * provider performs — and "decodes" them deterministically from the
  * header so the test can assert provider values flowed through the
  * engine untouched. Registered via
  * `src/test/resources/META-INF/services/graft.functions.MediaCodecProvider`. */
class TestServiceCodecProvider extends MediaCodecProvider {
  override def name: String = "test-service-codec"

  override def decodeAudio(b: Array[Byte]): Option[(Int, Int, Array[Double])] =
    if (b.length >= 10 && new String(b.take(8), "US-ASCII") == "GRAFTC1A") {
      val n = b(8) & 0xff
      Some((44100, b(9) & 0xff, Array.tabulate(n)(i => (i % 3) * 0.5)))
    } else None

  override def decodeVideo(b: Array[Byte]): Option[(Int, Int, Int)] =
    if (b.length >= 11 && new String(b.take(8), "US-ASCII") == "GRAFTC1V")
      Some(((b(8) & 0xff) * 10, (b(9) & 0xff) * 10, b(10) & 0xff))
    else None
}
