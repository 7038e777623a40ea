package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means with HASH-EXACT centroid updates (X45) —
  * the codebook trainer behind the IVF family (q47/q153 coarse
  * quantizers, q169's gated train→search arc, q170's occupancy audit).
  *
  * Shape per round: one assignment pass over the corpus (the caller's
  * compiled nearest-centroid flatMap — K dot products per row, no
  * shuffle), then a declarative per-(bucket, dim) mean via posexplode +
  * groupBy with map-side partial aggregation, so the update shuffle
  * carries O(K·d) cells per partition and the driver collects exactly
  * the K·d centroid cells (64×64 here — metadata-scale at any corpus
  * size). Empty buckets keep their previous centroid.
  *
  * Why the update is `round(sum(decimal)/count, 9)` and not `avg`:
  * double summation is order-dependent, so a plain avg would make the
  * learned centroids depend on partitioning — untestable across engines
  * and unstable across cluster sizes. Summing DECIMAL(28,12) casts is
  * EXACT (order-independent) and the two roundings are engine-agnostic
  * by construction: a binary double can never sit exactly on a decimal
  * half-grid point (that would need a factor of 5 in its denominator),
  * so double→DECIMAL(28,12) and round(·, 9) have no ties to break —
  * every engine that rounds to nearest produces the same digits. That
  * makes the whole training loop reproducible bit-for-bit in the DuckDB
  * oracle (q169's unrolled CTE rounds — the q156/q163 BPE-trainer
  * pattern applied to the vector side), and run-to-run deterministic on
  * a real cluster regardless of partition count or AQE decisions.
  *
  * 100 TB posture: per round, corpus work = one scan (assignment) + one
  * scan (update explode); shuffle volume after partial aggregation is
  * partitions × K·d cells; driver state is K·d doubles. Nothing grows
  * with the corpus. The K-dot-products-per-row assignment is the same
  * compiled island the IVF ladder already runs
  * ([[graft.queries.LlmQueries.ivfAssignCompiled]]).
  */
object KMeansTrainer {

  /** `iters` Lloyd rounds from `seeds` over `e` (columns: `vec_id` LONG,
    * `v` ARRAY<DOUBLE>). `assign(e, cents)` must return one
    * (vec_id, bucket) row per input row — bucket = index into `cents`,
    * nearest centroid under the caller's metric with a total tie order.
    * Returns the learned codebook in the seed layout; dims never present
    * in the data keep their seed value (and whole buckets their previous
    * centroid) — the rule the oracle mirrors with a COALESCE. */
  def train(
      e: DataFrame,
      seeds: Array[Array[Double]],
      iters: Int)(
      assign: (DataFrame, Array[Array[Double]]) => DataFrame): Array[Array[Double]] = {
    var cents = seeds.map(_.clone)
    for (_ <- 0 until iters) {
      val means = assign(e, cents)
        .join(e, "vec_id")
        .select(col("bucket"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("bucket", "pos")
        .agg(round(
          sum(col("x").cast("decimal(28,12)")).cast("double") / count(lit(1)),
          9).as("m"))
        .collect() // ≤ K·d rows — metadata-scale, never corpus-scale
      val next = cents.map(_.clone)
      // positions past the seed dimension are dropped, mirroring the
      // oracle (its per-dim aggregate ranges over the seed dims only) —
      // a ragged over-long vector must not crash the whole job with a
      // raw index error
      means.foreach { r =>
        val (b, pos) = (r.getInt(0), r.getInt(1))
        if (b >= 0 && b < next.length && pos < next(b).length)
          next(b)(pos) = r.getDouble(2)
      }
      cents = next
    }
    cents
  }
}
