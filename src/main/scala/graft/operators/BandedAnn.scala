package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-probe BANDED candidate generation over packed binary signatures
  * — the scale-safe replacement for q149's r13 all-pairs Hamming
  * crossJoin (VERDICT r13 "What's wrong" #1). The candidate RULE: a pair
  * (a, b) is a candidate iff SOME band of their signatures (`bands`
  * bands × `bandBits` bits) differs in ≤ `radius` bits; each anchor
  * keeps its `k` best candidates by (full Hamming, id). The rule is
  * deterministic and engine-replayable, so the DuckDB oracle replays it
  * exactly (min-band-Hamming ≤ radius — the q37/q47/q72 pinned-rule
  * pattern) and hash parity holds at any recall.
  *
  * Two physical plans behind one rule, the [[BroadcastNn]] byte-budget
  * device:
  *
  *  - WITHIN budget (`bands+signature` ≈ 24 B/row ⇒ a 10M-vector corpus
  *    is ~240 MB): the signature table broadcasts once as primitive
  *    arrays bucketed by (band, value); each anchor probes its
  *    `bands × |masks|` keys (37 masks at 8 bits/radius 2), dedups hits
  *    with an epoch-stamp array (multi-band duplicates cost O(1), never
  *    a `.distinct()` shuffle), XOR+popcounts only the DEDUP'd hits, and
  *    sorts its ≤|hits| packed `(ham << 56 | id)` longs to keep k. No
  *    pair-space materialization, no shuffle beyond the tiny anchor
  *    repartition.
  *  - PAST budget: a declarative EQUI-join — index side posts `bands`
  *    keys/row, probe side `bands × |masks|` keys/row (LINEAR key
  *    expansion each side; pairs materialize only where keys collide),
  *    then the value-distinct bounded top-K aggregate
  *    ([[graft.functions.TopK.smallestKDistinct]]: O(k) state per
  *    anchor, map-side combined). Fully distributed, no cross product
  *    of any flavor in either plan.
  *
  * Both paths implement the identical rule; BandedAnnSpec proves them
  * row-equal on real data by forcing the fallback with a zero budget.
  *
  * Parameter honesty (measured, LlmQueries q149 scaladoc has the
  * numbers): selectivity is a property of the CORPUS, not the plan —
  * near-dup corpora (cos ≥ 0.85) run selective at wide bands / small
  * radius, while this synthetic near-random corpus needs 8×8-bit bands
  * at radius 2 to keep mutual-NN recall ≥ 0.8 and then ~71% of pairs
  * collide somewhere. The structural win survives anyway: collision
  * volume is data-dependent, the O(n²)-ALWAYS crossJoin is gone, and at
  * 100 TB the knobs (bandBits up, radius down) tune cost against the
  * corpus's real NN gap without touching the plan. */
object BandedAnn {

  /** Per-anchor top-`k` banded-Hamming candidates over `df` itself
    * (self-join semantics, id ≠ candidate). Input: one `idCol` LONG
    * (< 2^56, nonneg) + one `sigCol` LONG signature per row. Returns
    * `(ia, ib)` — ≤ k rows per anchor, exactly the pairs the oracle's
    * `min-band-ham ≤ radius, ROW_NUMBER() OVER (PARTITION BY ia ORDER
    * BY ham, ib) ≤ k` rule selects. */
  def candidatesSelf(df: DataFrame, idCol: String, sigCol: String,
      bands: Int = 8, bandBits: Int = 8, radius: Int = 2, k: Int = 64,
      maxBroadcastBytes: Long = 512L << 20): DataFrame =
    candidates(df, df, idCol, sigCol, bands, bandBits, radius, k,
      maxBroadcastBytes)

  /** The asymmetric form (X58 graph maintenance): per-PROBE-anchor
    * top-`k` candidates drawn from `index` — the same rule as
    * [[candidatesSelf]] restricted to probe anchors, so rebuilding an
    * affected anchor's list against the current corpus reproduces the
    * self-join build's row set for that anchor exactly. Both frames
    * carry (`idCol`, `sigCol`); a probe row whose id also appears in
    * `index` never pairs with itself (the self-exclusion is by ID). */
  def candidates(probe: DataFrame, index: DataFrame,
      idCol: String, sigCol: String,
      bands: Int = 8, bandBits: Int = 8, radius: Int = 2, k: Int = 64,
      maxBroadcastBytes: Long = 512L << 20): DataFrame = {
    require(bands * bandBits <= 64, "signature is one 64-bit word")
    require(bandBits <= 16, s"bandBits $bandBits would explode the key space")
    val spark = probe.sparkSession
    import spark.implicits._
    val bandMask = (1L << bandBits) - 1
    val masks: Array[Int] = (0 until (1 << bandBits))
      .filter(m => Integer.bitCount(m) <= radius).toArray
    def norm(df: DataFrame) = df.select(col(idCol).cast("long").as("id"),
      col(sigCol).cast("long").as("sig"))
    val sigs = norm(index)

    // budget in ROWS: two longs + row/boxing overhead per corpus entry.
    // The path decision is an aggregate-scale count() (r14 ADVICE #5:
    // the old limit(rowCap+1).collect() probe pulled ~512 MB to the
    // driver before DECLINING the broadcast); rows reach the driver
    // only on the within-budget path.
    val rowCap = math.min(maxBroadcastBytes / 24L,
      (Int.MaxValue - 8).toLong).toInt
    val ds = sigs.as[(Long, Long)]
    if (ds.count() > rowCap)
      return declarative(norm(probe), sigs, bands, bandBits, radius, k, masks)
    // the collect is a SEPARATE action over the same plan (r15 ADVICE):
    // cap the pull at rowCap + 1 so an input that grew (or re-ordered
    // nondeterministically) between the two actions fails loudly below
    // instead of re-introducing the unbounded driver pull the cap exists
    // to prevent
    val corpus = ds.limit(rowCap + 1).collect()
    require(corpus.length <= rowCap,
      s"BandedAnn corpus grew past the broadcast row cap $rowCap between " +
        "the count() gate and the collect — nondeterministic input?")
    // id-domain guard (r14 ADVICE #3): the packed (ham << 56 | id)
    // ordering and its unmask silently corrupt on ids outside
    // [0, 2^56) — fail loudly instead of returning wrong candidates
    corpus.foreach { case (id, _) =>
      require(id >= 0L && id < (1L << 56),
        s"BandedAnn id $id outside the packed-ordering domain [0, 2^56)")
    }

    // ---------------------------------------- broadcast probe plan
    val sorted = corpus.sortBy(_._1) // ascending id: bucket scans emit
    val ids = sorted.map(_._1)       // candidates in id order
    val sg = sorted.map(_._2)
    val n = ids.length
    // CSR-style buckets: bucket (band, value) → corpus row indices
    val nKeys = bands << bandBits
    val starts = new Array[Int](nKeys + 1)
    var r = 0
    while (r < n) {
      var b = 0
      while (b < bands) {
        starts(((b << bandBits) +
          ((sg(r) >>> (b * bandBits)) & bandMask).toInt) + 1) += 1
        b += 1
      }
      r += 1
    }
    var kI = 0
    while (kI < nKeys) { starts(kI + 1) += starts(kI); kI += 1 }
    val fill = java.util.Arrays.copyOf(starts, nKeys)
    val bucket = new Array[Int](n * bands)
    r = 0
    while (r < n) {
      var b = 0
      while (b < bands) {
        val key = (b << bandBits) +
          ((sg(r) >>> (b * bandBits)) & bandMask).toInt
        bucket(fill(key)) = r
        fill(key) += 1
        b += 1
      }
      r += 1
    }
    val bc = spark.sparkContext.broadcast((ids, sg, starts, bucket))
    val bandsL = bands; val bandBitsL = bandBits; val kL = k
    val masksL = masks; val bandMaskL = bandMask
    norm(probe).as[(Long, Long)]
      // engage every core even when the parquet arrives single-split;
      // the INDEX side passed the byte budget, so this shuffle is tiny
      // relative to the probing work (self mode: probe IS the index)
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val (cids, csig, cst, cbk) = bc.value
        val m = cids.length
        val seen = new Array[Int](m) // epoch stamps: O(1) dedup, no sets
        var epoch = 0
        val buf = new Array[Long](m) // packed (ham << 56 | id) hits
        it.flatMap { case (ia, siga) =>
          epoch += 1
          var cnt = 0
          var b = 0
          while (b < bandsL) {
            val bval = ((siga >>> (b * bandBitsL)) & bandMaskL).toInt
            var mi = 0
            while (mi < masksL.length) {
              val key = (b << bandBitsL) + (bval ^ masksL(mi))
              var p = cst(key)
              val end = cst(key + 1)
              while (p < end) {
                val j = cbk(p)
                if (seen(j) != epoch && cids(j) != ia) {
                  seen(j) = epoch
                  buf(cnt) = (java.lang.Long.bitCount(siga ^ csig(j))
                    .toLong << 56) | cids(j)
                  cnt += 1
                }
                p += 1
              }
              mi += 1
            }
            b += 1
          }
          // ascending packed long order IS (ham ASC, id ASC)
          java.util.Arrays.sort(buf, 0, cnt)
          val keep = math.min(kL, cnt)
          val out = new Array[(Long, Long)](keep)
          var x = 0
          while (x < keep) {
            out(x) = (ia, buf(x) & 0x00ffffffffffffffL)
            x += 1
          }
          out.iterator
        }
      }
      .toDF("ia", "ib")
  }

  // same id-domain guard as the broadcast path, declaratively: the
  // IF is codegen'd per row (two long compares) and raise_error
  // fails the job instead of silently corrupting the packed order
  private def guardIds(sigs: DataFrame): DataFrame =
    sigs.withColumn("id", expr(
      "IF(id >= 0L AND id < 72057594037927936L, id, " +
        "raise_error(concat('BandedAnn id outside [0, 2^56): ', id)))"))

  private def indexKeyed(indexSigs: DataFrame, bands: Int,
      bandBits: Int): DataFrame = {
    val keySpan = 1 << bandBits
    val bandMask = keySpan - 1
    guardIds(indexSigs)
      .select(col("id").as("ib"), col("sig").as("sigb"))
      .withColumn("band", explode(lit((0 until bands).toArray)))
      .withColumn("key", col("band") * keySpan +
        expr(s"shiftright(sigb, band * $bandBits) & $bandMask"))
      .select(col("ib"), col("sigb"), col("key"))
  }

  private def probeKeyed(probeSigs: DataFrame, bands: Int, bandBits: Int,
      masks: Array[Int]): DataFrame = {
    val keySpan = 1 << bandBits
    val bandMask = keySpan - 1
    guardIds(probeSigs)
      .select(col("id").as("ia"), col("sig").as("siga"))
      .withColumn("band", explode(lit((0 until bands).toArray)))
      .withColumn("bval", expr(s"shiftright(siga, band * $bandBits) & $bandMask"))
      .withColumn("mask", explode(lit(masks)))
      .withColumn("key", col("band") * keySpan +
        col("bval").bitwiseXOR(col("mask")))
      .select(col("ia"), col("siga"), col("key"))
  }

  /** The identical rule as a distributed equi-join — the past-budget
    * plan (see object scaladoc). */
  private def declarative(probeSigs: DataFrame, indexSigs: DataFrame,
      bands: Int, bandBits: Int, radius: Int, k: Int,
      masks: Array[Int]): DataFrame =
    probeKeyed(probeSigs, bands, bandBits, masks)
      .join(indexKeyed(indexSigs, bands, bandBits), "key")
      .filter(col("ia") =!= col("ib"))
      .select(col("ia"), expr(
        "shiftleft(CAST(bit_count(siga ^ sigb) AS BIGINT), 56) | ib")
        .as("packed"))
      .groupBy("ia")
      .agg(graft.functions.TopK.smallestKDistinct(k, col("packed")).as("top"))
      .select(col("ia"), explode(expr(
        "transform(top, v -> v & 72057594037927935L)")).as("ib"))

  /** UNCAPPED banded collisions — the affected-anchor detection
    * primitive behind standing graph maintenance (X58): every DISTINCT
    * index id whose signature agrees with SOME probe signature on some
    * band within `radius` bits. No top-k cap: affectedness is a
    * reachability question, and a cap could hide an anchor whose
    * candidate set a changed vector perturbs. Declarative only — the
    * probe side is an O(changed) maintenance batch by contract, so its
    * bands × masks key expansion stays tiny and AQE broadcasts it
    * against the index side's linear `bands` keys/row pass (the slim
    * standing signature table; never the vector payloads). */
  def collidingIds(probe: DataFrame, index: DataFrame,
      idCol: String, sigCol: String,
      bands: Int = 8, bandBits: Int = 8, radius: Int = 2): DataFrame = {
    require(bands * bandBits <= 64, "signature is one 64-bit word")
    require(bandBits <= 16, s"bandBits $bandBits would explode the key space")
    val masks: Array[Int] = (0 until (1 << bandBits))
      .filter(m => Integer.bitCount(m) <= radius).toArray
    def norm(df: DataFrame) = df.select(col(idCol).cast("long").as("id"),
      col(sigCol).cast("long").as("sig"))
    probeKeyed(norm(probe), bands, bandBits, masks)
      .join(indexKeyed(norm(index), bands, bandBits), "key")
      .filter(col("ia") =!= col("ib"))
      .select(col("ib").as(idCol)).distinct()
  }
}
