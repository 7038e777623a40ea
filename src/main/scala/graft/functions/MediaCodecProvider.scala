package graft.functions

import java.util.ServiceLoader

import scala.jdk.CollectionConverters._

/** Compressed-payload codec seam (X6 — the one `partial` left after r10):
  * the JVM ships no H.264/AAC/Opus decoder, so compressed-payload decode
  * is an INTEGRATION POINT with a specified contract, not a stand-in to
  * pretend around. A deployment drops a provider jar (JavaCV/FFmpeg JNI,
  * a gRPC sidecar client, a hardware transcoder binding — anything) on
  * the executor classpath with a
  * `META-INF/services/graft.functions.MediaCodecProvider` entry and every
  * multimodal operator upgrades from the labeled stand-in to real decode
  * with zero engine changes — `ServiceLoader` is the standard JVM
  * mechanism for exactly this (how Spark itself discovers DSv2 providers
  * and codecs).
  *
  * Contract:
  *  - `decodeAudio` returns `(sampleRate, channels, samples)` with
  *    samples normalized to [-1, 1] interleaved by channel, or None when
  *    the payload is not a format this provider handles — None chains to
  *    the next provider, then to the engine's labeled stand-in
  *    (`decoded = false`), so pipeline CARDINALITY never depends on
  *    codec coverage.
  *  - `decodeVideo` returns `(width, height, frames)` or None, same
  *    chaining.
  *  - Implementations MUST be thread-safe and serializable-free: the
  *    engine never ships provider instances through closures — executors
  *    discover their own via the service loader (or [[MediaCodecs
  *    .register]] in same-JVM deployments), so native handles stay where
  *    they were created. Heavy init belongs in the provider's lazy state;
  *    [[Multimodal.extractFeatures]]' mapPartitions shape already
  *    amortizes per-partition lookup to one map read.
  *  - Throwing is treated as "cannot decode" for that payload (fault
  *    isolation: one corrupt frame must not kill a 100 TB pass). */
trait MediaCodecProvider {
  def name: String
  def decodeAudio(payload: Array[Byte]): Option[(Int, Int, Array[Double])]
  def decodeVideo(payload: Array[Byte]): Option[(Int, Int, Int)]
}

/** Provider registry: ServiceLoader discovery (the deployment path) plus
  * programmatic registration (tests, notebooks, same-JVM embedding).
  * Lazy and per-JVM — on a cluster each executor discovers from its own
  * classpath. */
object MediaCodecs {
  @volatile private var programmatic: List[MediaCodecProvider] = Nil

  private lazy val discovered: List[MediaCodecProvider] =
    ServiceLoader.load(classOf[MediaCodecProvider]).asScala.toList

  def providers: List[MediaCodecProvider] = programmatic ++ discovered

  def register(p: MediaCodecProvider): Unit =
    synchronized { programmatic = p :: programmatic }

  def unregister(p: MediaCodecProvider): Unit =
    synchronized { programmatic = programmatic.filterNot(_ eq p) }

  private def first[A](f: MediaCodecProvider => Option[A]): Option[A] =
    providers.iterator
      .map(p => try f(p) catch { case scala.util.control.NonFatal(_) => None })
      .collectFirst { case Some(a) => a }

  def audio(payload: Array[Byte]): Option[(Int, Int, Array[Double])] =
    first(_.decodeAudio(payload))

  def video(payload: Array[Byte]): Option[(Int, Int, Int)] =
    first(_.decodeVideo(payload))
}
