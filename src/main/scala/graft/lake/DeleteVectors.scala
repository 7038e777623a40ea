package graft.lake

/** v3 deletion vectors (M37) — the marquee Iceberg-v3 MoR change the
  * reference's own upgrade story targets (README.md:13-16: EMR ≥ 7.12 /
  * Iceberg ≥ 1.10 is exactly the DV-capable floor): position deletes for
  * one data file stored as ONE compressed bitmap row instead of one
  * parquet row per deleted position.
  *
  * Representation: sorted positions encoded as delta varints (LEB128)
  * behind a version byte. Dense runs cost ~1 byte/position, sparse
  * deletes ~2-5 bytes — 10-50× smaller than the 2-column parquet rows
  * they replace, which shrinks both the delete-file footprint and the
  * broadcast the MoR anti-join ships to every task. A DV "file" is a
  * small parquet of `(file_path, dv, cnt)` rows — one row per targeted
  * data file, written distributed (the bitmap for each data file is
  * built executor-side from that file's grouped positions; nothing
  * row-scale crosses the driver).
  *
  * Scoping mirrors position deletes: data files are immutable and
  * uniquely pathed, so a DV can only ever hit the file it was written
  * against — no sequence arithmetic needed on the read side. */
object DeleteVectors {

  /** Format version byte — future-proofing the on-disk bytes. */
  private val Version: Byte = 1

  /** Encode UNSORTED positions in place: sorts, encodes, and returns the
    * bitmap with its cardinality (distinct positions — the value
    * [[graft.lake.DeleteFileMeta.rowCount]] must carry; a count that
    * disagrees with the bitmap would poison every consumer). The single
    * definition both the engine and the native-DML writers share. */
  def encodeWithCount(positions: Array[Long]): (Array[Byte], Long) = {
    java.util.Arrays.sort(positions)
    var distinct = 0L; var i = 0; var prev = -1L
    while (i < positions.length) {
      if (positions(i) != prev) { distinct += 1; prev = positions(i) }
      i += 1
    }
    (encode(positions), distinct)
  }

  /** Encode positions (must be sorted ascending; duplicates collapse). */
  def encode(sorted: Array[Long]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(sorted.length + 1)
    out.write(Version)
    var prev = -1L
    var i = 0
    while (i < sorted.length) {
      val p = sorted(i)
      if (p != prev) {
        require(p > prev, s"positions not sorted: $p after $prev")
        var delta = p - prev // ≥ 1
        while ((delta & ~0x7fL) != 0) {
          out.write(((delta & 0x7f) | 0x80).toInt)
          delta >>>= 7
        }
        out.write(delta.toInt)
        prev = p
      }
      i += 1
    }
    out.toByteArray
  }

  /** Decode to the original sorted positions. Corrupt input (truncated
    * varint, runaway continuation bits) fails with a descriptive error
    * instead of an index crash or silently-wrong positions (review
    * r7). */
  def decode(bytes: Array[Byte]): Array[Long] = {
    require(bytes.nonEmpty && bytes(0) == Version,
      s"unknown deletion-vector format version: ${bytes.headOption.getOrElse(-1)}")
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var prev = -1L
    var i = 1
    while (i < bytes.length) {
      var delta = 0L
      var shift = 0
      var b = 0
      do {
        if (i >= bytes.length)
          throw new IllegalArgumentException(
            "corrupt deletion vector: truncated varint at end of buffer")
        if (shift > 63)
          throw new IllegalArgumentException(
            "corrupt deletion vector: varint continuation exceeds 64 bits")
        b = bytes(i) & 0xff
        delta |= (b & 0x7fL) << shift
        shift += 7
        i += 1
      } while ((b & 0x80) != 0)
      prev += delta
      out += prev
    }
    out.toArray
  }

  /** Per-JVM memoized decode, keyed by byte-array IDENTITY (a broadcast
    * deserializes once per executor, so every task sees the same array
    * instances): each bitmap decodes once per executor, membership tests
    * binary-search the cached sorted positions. The crude size cap keeps
    * a long-lived executor serving many tables/broadcasts bounded. */
  private val decodeCache =
    new java.util.concurrent.ConcurrentHashMap[Array[Byte], Array[Long]]()

  def contains(bytes: Array[Byte], pos: Long): Boolean = {
    if (decodeCache.size > 4096) decodeCache.clear()
    val arr = decodeCache.computeIfAbsent(bytes, decode(_))
    java.util.Arrays.binarySearch(arr, pos) >= 0
  }
}
