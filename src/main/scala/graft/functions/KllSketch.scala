package graft.functions

import java.nio.ByteBuffer

/** Mergeable QUANTILE sketch (the KLL compactor hierarchy of Karnin/
  * Lang/Liberty, FOCS'16) — the percentile analog of the HLL device
  * ([[graft.operators.SketchWau]]): Spark ships mergeable HLL aggregates
  * but NO mergeable quantile sketch (`approx_percentile`'s GK state
  * never surfaces as a storable column), so rolling-window or
  * incrementally-refreshed percentiles (q88/q122/q129/q132 all document
  * the "approx swap at 100 TB" in prose) had no materializable carrier.
  * This is that carrier: a compactor hierarchy where level h holds items
  * of weight 2^h; a full level sorts, keeps every other item (promoting
  * the half to level h+1) and the rank error concentrates at
  * O(1/k) relative rank — ~1% at the default k=200.
  *
  * Two deliberate deviations from the paper, both documented trades:
  *  - DETERMINISTIC compaction parity (alternating per level-compaction
  *    counter) instead of coin flips: re-running a pipeline or retrying
  *    a failed stage produces the same sketch bytes for the same
  *    partition content (the q135 auditability argument). The cost is
  *    the adversarial-input guarantee — fine for telemetry-like values,
  *    wrong for inputs chosen by an adversary who knows the parity.
  *  - Fixed per-level capacity floor (2) with the paper's (2/3)^depth
  *    taper from the top, recomputed as levels appear.
  *
  * The serialized form is a plain versioned byte layout (k, n, counters,
  * level buffers) — a parquet BINARY column; [[KllAgg]]/[[KllMergeAgg]]
  * build and merge it distributively. Merge is concatenate-then-compact,
  * exactly the paper's merge, so sketch(A ∪ B) and
  * merge(sketch(A), sketch(B)) obey the same error bound (spec-gated
  * differentially). */
final class KllState(val k: Int) extends Serializable {
  var n: Long = 0L
  /** levels(h) holds items of weight 2^h; level 0 is the insert buffer. */
  var levels: Array[Array[Double]] = Array(Array.emptyDoubleArray)
  /** per-level compaction counters driving the deterministic parity. */
  var compactions: Array[Long] = Array(0L)

  private def capacity(h: Int): Int = {
    // taper from the TOP level down: cap(top) = k, each level below 2/3
    val depthFromTop = levels.length - 1 - h
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, depthFromTop)).toInt)
  }

  private def totalCapacity: Int =
    (0 until levels.length).map(capacity).sum

  private def size: Int = {
    var s = 0; var h = 0
    while (h < levels.length) { s += levels(h).length; h += 1 }
    s
  }

  // level-0 insert buffer: doubling array, flushed into levels(0) when
  // it reaches the level-0 cap — a per-row `:+` append would copy the
  // whole buffer on every update (quadratic in the hot path)
  private var buf0: Array[Double] = new Array[Double](64)
  private var n0: Int = 0

  private def flush(): Unit = if (n0 > 0) {
    levels(0) = levels(0) ++ java.util.Arrays.copyOfRange(buf0, 0, n0)
    n0 = 0
  }

  def update(v: Double): Unit = {
    if (n0 == buf0.length)
      buf0 = java.util.Arrays.copyOf(buf0, buf0.length * 2)
    buf0(n0) = v; n0 += 1; n += 1
    if (n0 >= capacity(0)) { flush(); compress() }
  }

  def mergeWith(o: KllState): Unit = {
    flush(); o.flush()
    if (o.n == 0) return
    if (levels.length < o.levels.length) {
      levels = levels.padTo(o.levels.length, Array.emptyDoubleArray)
      compactions = compactions.padTo(o.levels.length, 0L)
    }
    var h = 0
    while (h < o.levels.length) {
      if (o.levels(h).nonEmpty) levels(h) = levels(h) ++ o.levels(h)
      compactions(h) += o.compactions(h)
      h += 1
    }
    n += o.n
    compress()
  }

  private def compress(): Unit = {
    // compact bottom-up while over budget — each pass halves the
    // fullest low level; loop terminates because size strictly drops
    var guard = 0
    while (size > totalCapacity && guard < 64) {
      var h = 0
      var done = false
      while (h < levels.length && !done) {
        if (levels(h).length >= capacity(h)) {
          compactLevel(h)
          done = true
        }
        h += 1
      }
      if (!done) return // under every per-level cap: nothing to do
      guard += 1
    }
  }

  private def compactLevel(h: Int): Unit = {
    if (h == levels.length - 1) {
      levels = levels :+ Array.emptyDoubleArray
      compactions = compactions :+ 0L
    }
    val buf = levels(h).sorted
    // deterministic parity: alternates with the level's compaction count
    val offset = (compactions(h) & 1L).toInt
    compactions(h) += 1
    val keep = new Array[Double]((buf.length - offset + 1) / 2)
    var i = offset; var j = 0
    while (i < buf.length) { keep(j) = buf(i); j += 1; i += 2 }
    // odd-sized buffers promote ⌈len/2⌉ or ⌊len/2⌋ items; the dropped
    // half's weight moves to the kept half one level up (weight 2^(h+1))
    levels(h + 1) = levels(h + 1) ++ keep.take(j)
    // an odd straggler when offset=1 and len odd: keep count j computed
    // above already covers it; the un-promoted residue is discarded by
    // the compaction semantics (its weight is represented by the kept
    // neighbors)
    levels(h) = Array.emptyDoubleArray
  }

  /** Estimated value at quantile q ∈ [0,1]: walk the weighted items in
    * sorted order to cumulative weight ⌈q·W⌉ (W = the sketch's own
    * total weight — see the drift note below). */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"quantile out of range: $q")
    if (n == 0) return Double.NaN
    flush()
    val items = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => items += ((v, w)))
      h += 1
    }
    val sorted = items.sortBy(_._1)
    // walk against the sketch's own total weight W, not n: odd-length
    // compactions drift W by ±2^h, and q=1 must land on the true max
    val totalW = sorted.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(q * totalW).toLong)
    var cum = 0L; var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return sorted(i)._1
      i += 1
    }
    sorted.last._1
  }

  /** Estimated rank of x: total weight of items ≤ x. */
  def rank(x: Double): Long = {
    flush()
    var r = 0L; var h = 0
    while (h < levels.length) {
      val w = 1L << h
      levels(h).foreach(v => if (v <= x) r += w)
      h += 1
    }
    r
  }

  def serialize(): Array[Byte] = {
    flush()
    var bytes = 4 + 8 + 4
    levels.foreach(l => bytes += 8 + 4 + l.length * 8)
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(k); bb.putLong(n); bb.putInt(levels.length)
    var h = 0
    while (h < levels.length) {
      bb.putLong(compactions(h))
      bb.putInt(levels(h).length)
      levels(h).foreach(bb.putDouble)
      h += 1
    }
    bb.array()
  }
}

object KllState {
  val DefaultK = 200

  def deserialize(b: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(b)
    val s = new KllState(bb.getInt)
    s.n = bb.getLong
    val nl = bb.getInt
    require(nl >= 1 && nl <= 64, s"corrupt KLL payload: $nl levels")
    s.levels = new Array[Array[Double]](nl)
    s.compactions = new Array[Long](nl)
    var h = 0
    while (h < nl) {
      s.compactions(h) = bb.getLong
      val len = bb.getInt
      require(len >= 0 && len <= b.length / 8,
        s"corrupt KLL payload: level $h length $len")
      val arr = new Array[Double](len)
      var i = 0
      while (i < len) { arr(i) = bb.getDouble; i += 1 }
      s.levels(h) = arr
      h += 1
    }
    s
  }
}
