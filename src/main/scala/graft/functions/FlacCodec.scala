package graft.functions

/** Pure-JVM FLAC decoder (RFC 9639 subset) — the first REAL compressed
  * codec behind the X6 audio path, closing the "compressed payload decode
  * is a stand-in" gap for one genuine format without any native library:
  * STREAMINFO + audio frames with CONSTANT, VERBATIM, FIXED (orders 0–4)
  * and LPC subframes, partitioned Rice/Rice2 residuals (escape
  * partitions included), wasted bits, and all four channel assignments
  * (independent, left/side, right/side, mid/side). Returns
  * `(sampleRate, channels, samples)` with samples interleaved and
  * normalized to [-1, 1] — the same contract as
  * [[Multimodal.decodeAudio]] and [[MediaCodecProvider.decodeAudio]].
  *
  * Untrusted-input posture (the WAV/MP4 walk rules): every structural
  * violation — bad magic, short reads, reserved codes, CRC-8 header
  * mismatch, block sizes or channel counts outside the spec — returns
  * None, never a thrown task; decoded volume is capped by STREAMINFO's
  * total-samples and hard sanity bounds so a crafted payload cannot
  * balloon memory. H.264/AAC/Opus payload decode remains the
  * [[MediaCodecProvider]] seam (the JVM ships no such codec); FLAC is
  * pure integer DSP and needs nothing the JVM lacks. */
object FlacCodec {

  /** Structural failure → unwind to None (control flow local to decode;
    * never escapes). */
  private final class Bail extends RuntimeException(null, null, false, false)
  private def bail(): Nothing = throw new Bail

  private final class BitReader(b: Array[Byte]) {
    var pos: Long = 0L // absolute bit position
    private val end: Long = b.length.toLong * 8
    def bytePos: Int = (pos >> 3).toInt
    def remaining: Long = end - pos
    def bit(): Int = {
      if (pos >= end) bail()
      val r = (b((pos >> 3).toInt) >> (7 - (pos & 7)).toInt) & 1
      pos += 1; r
    }
    def bits(n: Int): Long = { // n ≤ 56, big-endian bit order
      if (n == 0) return 0L
      if (n < 0 || n > 56 || remaining < n) bail()
      var acc = 0L; var i = 0
      while (i < n) { acc = (acc << 1) | bit(); i += 1 }
      acc
    }
    def signedBits(n: Int): Long = {
      val u = bits(n)
      if (n == 0) 0L
      else if ((u & (1L << (n - 1))) != 0) u - (1L << n)
      else u
    }
    def unary(): Int = { // q zero-bits then a one-bit → q
      var q = 0
      while (bit() == 0) { q += 1; if (q > (1 << 20)) bail() }
      q
    }
    def alignByte(): Unit = pos = (pos + 7) & ~7L
  }

  private def crc8(b: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= b(i) & 0xff
      var k = 0
      while (k < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff
              else (crc << 1) & 0xff
        k += 1
      }
      i += 1
    }
    crc
  }

  private val FixedCoefs: Array[Array[Long]] = Array(
    Array(), Array(1L), Array(2L, -1L), Array(3L, -3L, 1L),
    Array(4L, -6L, 4L, -1L))

  /** Rice-coded (or escaped-raw) residual into `out[order until n]`. */
  private def residual(r: BitReader, out: Array[Long], order: Int, n: Int): Unit = {
    val method = r.bits(2).toInt
    if (method > 1) bail()
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrder = r.bits(4).toInt
    val parts = 1 << partOrder
    if ((n & (parts - 1)) != 0) bail() // blockSize must divide evenly
    var idx = order
    var p = 0
    while (p < parts) {
      val count = (n >> partOrder) - (if (p == 0) order else 0)
      if (count < 0) bail()
      val param = r.bits(paramBits).toInt
      if (param == escape) {
        val raw = r.bits(5).toInt
        var i = 0
        while (i < count) { out(idx) = r.signedBits(raw); idx += 1; i += 1 }
      } else {
        var i = 0
        while (i < count) {
          val q = r.unary().toLong
          val u = (q << param) | r.bits(param)
          out(idx) = (u >>> 1) ^ -(u & 1L) // zigzag
          idx += 1; i += 1
        }
      }
      p += 1
    }
    if (idx != n) bail()
  }

  private def predictFixed(x: Array[Long], order: Int, n: Int): Unit = {
    val c = FixedCoefs(order)
    var i = order
    while (i < n) {
      var acc = 0L; var j = 0
      while (j < order) { acc += c(j) * x(i - 1 - j); j += 1 }
      x(i) += acc
      i += 1
    }
  }

  private def subframe(r: BitReader, n: Int, ebps: Int): Array[Long] = {
    if (r.bit() != 0) bail() // padding bit
    val tpe = r.bits(6).toInt
    val wasted = if (r.bit() == 1) r.unary() + 1 else 0
    val bps = ebps - wasted
    if (bps <= 0 || bps > 33) bail()
    val x = new Array[Long](n)
    tpe match {
      case 0 => // CONSTANT
        val v = r.signedBits(bps)
        java.util.Arrays.fill(x, v)
      case 1 => // VERBATIM
        var i = 0; while (i < n) { x(i) = r.signedBits(bps); i += 1 }
      case t if t >= 8 && t <= 12 => // FIXED order 0-4
        val order = t - 8
        if (order > n) bail()
        var i = 0; while (i < order) { x(i) = r.signedBits(bps); i += 1 }
        residual(r, x, order, n)
        predictFixed(x, order, n)
      case t if t >= 32 => // LPC, order 1-32
        val order = t - 31
        if (order > n) bail()
        var i = 0; while (i < order) { x(i) = r.signedBits(bps); i += 1 }
        val precision = r.bits(4).toInt + 1
        if (precision == 16) bail() // coefficient-precision 0b1111 is invalid
        val shift = r.signedBits(5).toInt
        if (shift < 0) bail()
        val coefs = new Array[Long](order)
        i = 0; while (i < order) { coefs(i) = r.signedBits(precision); i += 1 }
        residual(r, x, order, n)
        i = order
        while (i < n) {
          var acc = 0L; var j = 0
          while (j < order) { acc += coefs(j) * x(i - 1 - j); j += 1 }
          x(i) += acc >> shift
          i += 1
        }
      case _ => bail()
    }
    if (wasted > 0) { var i = 0; while (i < n) { x(i) <<= wasted; i += 1 } }
    x
  }

  private val RateTable = Array(0, 88200, 176400, 192000, 8000, 16000,
    22050, 24000, 32000, 44100, 48000, 96000)

  def decode(b: Array[Byte]): Option[(Int, Int, Array[Double])] =
    try decodeOrBail(b) catch { case _: Bail => None
      case scala.util.control.NonFatal(_) => None }

  private def decodeOrBail(b: Array[Byte]): Option[(Int, Int, Array[Double])] = {
    if (b.length < 42 || b(0) != 'f' || b(1) != 'L' || b(2) != 'a' || b(3) != 'C')
      return None
    // ------------------------------------------------- metadata blocks
    var off = 4
    var siRate = 0; var siChannels = 0; var siBps = 0; var siTotal = 0L
    var seenStreamInfo = false
    var last = false
    while (!last) {
      if (off + 4 > b.length) bail()
      val hdr = b(off) & 0xff
      last = (hdr & 0x80) != 0
      val tpe = hdr & 0x7f
      val len = ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) |
        (b(off + 3) & 0xff)
      off += 4
      if (off + len > b.length) bail()
      if (tpe == 0) { // STREAMINFO: fixed 34-byte layout
        if (len < 34) bail()
        val r = new BitReader(b)
        r.pos = off.toLong * 8 + 16 + 16 + 24 + 24 // skip block/frame sizes
        siRate = r.bits(20).toInt
        siChannels = r.bits(3).toInt + 1
        siBps = r.bits(5).toInt + 1
        siTotal = r.bits(36)
        seenStreamInfo = true
      }
      off += len
    }
    if (!seenStreamInfo || siRate <= 0 || siChannels < 1 || siChannels > 8)
      return None
    // sanity caps: a crafted STREAMINFO cannot balloon the output
    val maxSamples =
      math.min(if (siTotal > 0) siTotal else Long.MaxValue, 1L << 26).toInt

    // -------------------------------------------------------- frames
    val out = new java.util.ArrayList[Array[Double]]()
    var decoded = 0L
    val r = new BitReader(b)
    r.pos = off.toLong * 8
    var frames = 0
    var halted = false
    // set while the frame-SYNC pattern is being checked: a Bail there at
    // a frame boundary is trailing garbage (appended tag / ripper junk);
    // a Bail PAST it — header fields, CRC-8, subframes — is mid-stream
    // corruption and must fail the decode, not silently truncate it
    // (ADVICE r13). The one exception: a frame start so close to EOF
    // that no legal frame fits (ID3v1 is exactly 128 bytes) may bail
    // anywhere in it and still count as trailing garbage.
    var syncPhase = false
    var frameStartByte = 0 // last frame's start, for the EOF-window test
    while (!halted && r.remaining >= 40 && decoded < maxSamples &&
        frames < (1 << 20)) try {
        val frameStart = r.bytePos
        frameStartByte = frameStart
        syncPhase = true
        if (r.bits(14) != 0x3ffe) bail()
        syncPhase = false
        if (r.bit() != 0) bail() // reserved
        r.bit() // blocking strategy
        val bsCode = r.bits(4).toInt
        val srCode = r.bits(4).toInt
        val chanAsgn = r.bits(4).toInt
        val ssCode = r.bits(3).toInt
        if (r.bit() != 0) bail() // reserved
        // UTF-8-coded frame/sample number: parse and discard
        val first = r.bits(8).toInt
        // 0xFF is not a valid lead byte in FLAC's coded-number encoding
        // (the longest legal sequence leads with 0xFE); the extra==8 case
        // the old check guarded is unreachable because the loop caps at 7
        if (first == 0xff) bail()
        var extra = 0
        var mask = 0x80
        while ((first & mask) != 0 && extra < 7) { extra += 1; mask >>= 1 }
        if (extra == 1) bail()
        var k = 0
        while (k < math.max(0, extra - 1)) {
          if ((r.bits(8).toInt & 0xc0) != 0x80) bail()
          k += 1
        }
        val blockSize = bsCode match {
          case 0 => bail()
          case 1 => 192
          case c if c >= 2 && c <= 5 => 576 << (c - 2)
          case 6 => r.bits(8).toInt + 1
          case 7 => r.bits(16).toInt + 1
          case c => 256 << (c - 8)
        }
        if (blockSize <= 0 || blockSize > 65536) bail()
        val rate = srCode match {
          case 0 => siRate
          case c if c <= 11 => RateTable(c)
          case 12 => r.bits(8).toInt * 1000
          case 13 => r.bits(16).toInt
          case 14 => r.bits(16).toInt * 10
          case _ => bail()
        }
        val bps = ssCode match {
          case 0 => siBps
          case 1 => 8
          case 2 => 12
          case 4 => 16
          case 5 => 20
          case 6 => 24
          case 7 => 32
          case _ => bail()
        }
        // CRC-8 over the header bytes (frame start through pre-CRC byte)
        if ((r.pos & 7) != 0) bail() // header is byte-aligned pre-CRC
        val expected = crc8(b, frameStart, r.bytePos)
        if (r.bits(8).toInt != expected) bail()

        val channels = if (chanAsgn < 8) chanAsgn + 1
          else if (chanAsgn <= 10) 2
          else bail()
        if (channels != siChannels) bail()

        val chans = new Array[Array[Long]](channels)
        var c = 0
        while (c < channels) {
          val side = (chanAsgn == 8 && c == 1) || (chanAsgn == 9 && c == 0) ||
            (chanAsgn == 10 && c == 1)
          chans(c) = subframe(r, blockSize, bps + (if (side) 1 else 0))
          c += 1
        }
        r.alignByte()
        r.bits(16) // frame footer CRC-16 (presence required; not verified)

        // stereo decorrelation
        chanAsgn match {
          case 8 => // left/side → right = left - side
            var i = 0
            while (i < blockSize) { chans(1)(i) = chans(0)(i) - chans(1)(i); i += 1 }
          case 9 => // side/right → left = side + right
            val sideCh = chans(0)
            var i = 0
            while (i < blockSize) { sideCh(i) = sideCh(i) + chans(1)(i); i += 1 }
          case 10 => // mid/side
            var i = 0
            while (i < blockSize) {
              val side = chans(1)(i)
              val mid = (chans(0)(i) << 1) | (side & 1L)
              chans(0)(i) = (mid + side) >> 1
              chans(1)(i) = (mid - side) >> 1
              i += 1
            }
          case _ => ()
        }

        val take = math.min(blockSize.toLong, maxSamples - decoded).toInt
        val norm = (1L << (bps - 1)).toDouble
        val inter = new Array[Double](take * channels)
        var i = 0
        while (i < take) {
          c = 0
          while (c < channels) {
            inter(i * channels + c) = chans(c)(i) / norm
            c += 1
          }
          i += 1
        }
        out.add(inter)
        decoded += take
        frames += 1
    } catch {
      // Trailing bytes after the final frame (an appended ID3v1 tag,
      // ripper junk) fail the SYNC check; once at least one frame
      // decoded, keep the accumulated samples instead of bailing the
      // whole file — the same posture as decodeMp3 on trailing garbage.
      // A failure before ANY frame decoded, or PAST the sync pattern
      // with room for a real frame (header/CRC/subframe corruption
      // mid-stream), still bails the decode (ADVICE r13: swallowing
      // those reported a truncated file as a successful decode).
      case e: Bail =>
        // the EOF window is 128 BYTES measured from the FRAME START,
        // inclusive — ID3v1 is EXACTLY 128 bytes, so a tag starting at
        // a frame boundary leaves exactly 128 (r14 ADVICE: the old
        // `r.remaining < 128` was 16 bytes of BITS at the bail point —
        // a trailing tag whose first 14 bits matched the sync pattern
        // failed the whole decode). Known tradeoff, accepted with the
        // window: a CORRUPT legal final frame shorter than the window
        // is indistinguishable from a tag without decoding it, and the
        // tag is the common case (same posture as decodeMp3).
        if (frames > 0 && (syncPhase || b.length - frameStartByte <= 128))
          halted = true
        else throw e
    }
    if (frames == 0) return None
    var total = 0
    out.forEach(a => total += a.length)
    val all = new Array[Double](total)
    var at = 0
    out.forEach { a => System.arraycopy(a, 0, all, at, a.length); at += a.length }
    Some((siRate, siChannels, all))
  }
}
