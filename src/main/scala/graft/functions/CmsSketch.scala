package graft.functions

import java.nio.ByteBuffer

/** Mergeable COUNT-MIN frequency sketch (Cormode/Muthukrishnan '05) —
  * the frequency member of the stored-sketch suite (distinct =
  * [[graft.operators.SketchWau]] HLL, quantiles = [[KllState]], this =
  * per-key counts): a depth×width counter grid where each row hashes
  * the key independently and a point query takes the MINIMUM across
  * rows. Always an OVERestimate (collisions only add), with additive
  * error ≤ e·N/width per row at depth-row confidence — the windowed
  * heavy-hitter recount device: q117's Misra–Gries pass yields
  * CANDIDATES but their exact recount needs a second corpus pass; a
  * stored daily CMS answers the recount for ANY later window from
  * O(days) sketch merges (merge = element-wise add, exactly
  * distributive) without touching the raw events again.
  *
  * Determinism: row hashes are splitmix64 finalizations of
  * (key ⊕ rowSeed) — fixed seeds, so identical content builds identical
  * bytes on every run and retry (the [[KllState]] reproducibility
  * posture; CMS needs no randomness trade at all, its bounds are
  * per-hash-family and the family is fixed). Keys are LONGs — hash
  * wider values to 64 bits first (`xxhash64`), the q29 exact-dedup
  * key discipline. */
final class CmsState(val depth: Int, val width: Int) extends Serializable {
  require(depth >= 1 && depth <= 16 && width >= 16 && (width & (width - 1)) == 0,
    s"cms: depth in [1,16], width a power of two >= 16; got $depth x $width")
  var n: Long = 0L
  val table: Array[Long] = new Array[Long](depth * width)

  @inline private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  @inline private def slot(row: Int, key: Long): Int =
    row * width + (mix(key ^ (row.toLong * 0xc2b2ae3d27d4eb4fL)) &
      (width - 1)).toInt

  def update(key: Long, inc: Long = 1L): Unit = {
    var r = 0
    while (r < depth) { table(slot(r, key)) += inc; r += 1 }
    n += inc
  }

  /** Point estimate: min across rows — never below the true count. */
  def estimate(key: Long): Long = {
    var best = Long.MaxValue
    var r = 0
    while (r < depth) {
      val v = table(slot(r, key))
      if (v < best) best = v
      r += 1
    }
    best
  }

  def mergeWith(o: CmsState): Unit = {
    require(o.depth == depth && o.width == width,
      s"cms merge: dimension mismatch ($depth x $width vs ${o.depth} x ${o.width})")
    var i = 0
    while (i < table.length) { table(i) += o.table(i); i += 1 }
    n += o.n
  }

  def serialize(): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 4 + 8 + table.length * 8)
    bb.putInt(depth); bb.putInt(width); bb.putLong(n)
    table.foreach(bb.putLong)
    bb.array()
  }
}

object CmsState {
  val DefaultDepth = 5
  val DefaultWidth = 2048

  def deserialize(b: Array[Byte]): CmsState = {
    val bb = ByteBuffer.wrap(b)
    val s = new CmsState(bb.getInt, bb.getInt)
    s.n = bb.getLong
    var i = 0
    while (i < s.table.length) { s.table(i) = bb.getLong; i += 1 }
    s
  }
}
