package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Budget-gated raw-vector fetch for candidate PAIR tables — the exact-
  * cosine re-rank tail of the ANN paths (q149 mutual-NN, q162 k-NN
  * graph). VERDICT r14 "What's wrong" #1: those queries hinted
  * `broadcast(fullVectorTable)` UNCONDITIONALLY on both pair sides —
  * ~520 B/row at 64 double dims is ~5 GB at 10M vectors, past Spark's
  * broadcast limits and driver memory long before the candidate stage's
  * own byte-budget gives out. This helper restores the [[BroadcastNn]] /
  * [[BandedAnn]] posture for the re-rank:
  *
  *  - WITHIN `maxBroadcastBytes` (estimated as rows × (8·d + overhead)
  *    from one aggregate pass — never a driver materialization): hint
  *    ONE broadcast plan and join it on both pair sides under two
  *    aliases, so ReuseExchange builds the broadcast once, not twice
  *    (the exactJaccard aliasing device, LlmQueries.scala).
  *  - PAST the budget: the same two equi-joins UNHINTED — a plain
  *    shuffle join of K·|V| candidate rows against |V| vector rows is a
  *    healthy linear plan, and any runtime broadcast decision is left
  *    to Catalyst/AQE STATS (size-gated), never forced. Row-equality of
  *    the two plans is spec-forced with a zero budget
  *    (VectorJoinSpec), the BandedAnnSpec pattern.
  *
  * The join itself is semantics-free column plumbing (inner equi-join on
  * ids the candidate stage emitted), so no oracle entry is needed — the
  * hash gates of q149/q162 cover it end to end. */
object VectorJoin {

  /** Attach raw vectors to both sides of a candidate pair table.
    * `cand` carries pair ids in `aCol`/`bCol`; `vectors` is the
    * (idCol, vecCol) corpus. Returns every `cand` column plus the two
    * vector columns named `va`/`vb`. */
  def attachPair(cand: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String,
      aCol: String = "ia", bCol: String = "ib",
      maxBroadcastBytes: Long = 512L << 20): DataFrame = {
    val vecs = vectors.select(col(idCol).cast("long").as("__vid"),
      col(vecCol).as("__v"))
    // Catalyst's file-source estimate is ON-DISK bytes — a LOWER bound
    // on the unsafe-row footprint (decompression only inflates), so it
    // can prove OVER-budget for free but must never prove under:
    // compressible vector encodings (quantized or sparse-stored-dense
    // embeddings dictionary/RLE-compress well) can sit 10× below their
    // in-memory size, and a forced broadcast on that misread is exactly
    // the r14 failure class this device closes. So the stats shortcut
    // only ever picks the SAFE side; within budget the exact
    // aggregate-scale probe below decides (never a driver pull).
    val planBytes = vecs.queryExecution.optimizedPlan.stats.sizeInBytes
    val side = if (planBytes > BigInt(maxBroadcastBytes)) {
      vecs
    } else {
      // budget probe at aggregate scale (r14 ADVICE posture — decide
      // the path without pulling rows to the driver): one pass computes
      // the corpus row count and max dimension; bytes/row is the
      // BroadcastNn model (8·d array payload + row/boxing overhead)
      val stats = vecs.agg(count(lit(1)).as("n"),
        max(size(col("__v"))).as("d")).head()
      val n = stats.getLong(0)
      val d = if (stats.isNullAt(1)) 0 else math.max(stats.getInt(1), 0)
      val rowCap = maxBroadcastBytes / (8L * d + 64L)
      if (n <= rowCap) broadcast(vecs) else vecs
    }
    val keep = cand.columns.map(col).toSeq
    cand.join(side.as("__A"), col(aCol) === col("__A.__vid"))
      .join(side.as("__B"), col(bCol) === col("__B.__vid"))
      .select(keep :+ col("__A.__v").as("va") :+ col("__B.__v").as("vb"): _*)
  }
}
