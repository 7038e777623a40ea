package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** k-NN graph DEGREE PRUNING (X54, r18 — VERDICT r17 next-step #6): the
  * HNSW-style neighbor-diversification heuristic run between graph
  * construction (q162) and index use. Hub vectors — points moderately
  * close to EVERYTHING, the classic high-dimensional failure q165's
  * in-degree audit measures — absorb a slot in every anchor's top-k
  * list while adding no routing value: any hub-routed search step is
  * dominated by a step through a genuinely close neighbor. The pruning
  * rule (Malkov & Yashunin's SELECT_NEIGHBORS_HEURISTIC, also NSG/
  * DiskANN's α=1 RNG rule): scan an anchor's candidates best-first and
  * KEEP a candidate iff it is STRICTLY closer to the anchor than to
  * every already-kept neighbor — an edge dominated by a kept edge is
  * redundant for navigation. Deterministic on (sim DESC, id): the scan
  * order is q162's rank and every comparison is between raw cosines of
  * the same double arrays, so a DuckDB oracle replays it exactly
  * (unrolled per-rank CTEs, q182).
  *
  * Shape: one self-join of the ≤k-per-anchor edge list on the anchor
  * (≤k²/2 rows per anchor), one [[VectorJoin.attachPair]] vector fetch
  * for the neighbor-neighbor cosines (budget-gated, never an
  * unconditional corpus broadcast), then a per-anchor FOLD over the
  * collected ≤k-element lists. The fold is genuinely sequential (each
  * decision depends on the kept-set so far) and bounded at k² ≈ 100
  * comparisons per anchor, so a Scala UDF over the two collected
  * arrays is the honest spelling — it runs map-side after one
  * aggregation exchange on the anchor id, carrying k·(id, sim) plus
  * k²/2 pair sims per group. 100 TB: linear in |V| like q162 itself;
  * no stage sees more than one anchor's lists at once. */
object KnnPrune {

  /** `edges`: (src, rank, dst, sim) with RAW (unrounded) sims, rank
    * dense 1..k per anchor in (sim DESC, dst) order — q162's layout.
    * `vectors`: the (idCol, vecCol) corpus for neighbor-neighbor
    * cosines. Returns every edge with a `kept` flag. */
  def diversify(edges: DataFrame, vectors: DataFrame,
      idCol: String, vecCol: String): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("rank").cast("int").as("rank"),
      col("dst"), col("sim").cast("double").as("sim"))
      // LAZY cut (r19 optimization round): all three consumers (the
      // self-join's two sides and the nbrs collect) exchange on src, so
      // ReuseExchange builds the edge shuffle once inside the single
      // consuming job; the persist catches any miss. The eager form
      // paid a full barrier job before any consumer ran.
      .localCheckpoint(false)
    val pairs = e.as("x").join(e.as("y"),
        col("x.src") === col("y.src") && col("x.rank") < col("y.rank"))
      .select(col("x.src").as("psrc"), col("x.rank").as("ra"),
        col("y.rank").as("rb"), col("x.dst").as("ia"), col("y.dst").as("ib"))
    val nbrSims = VectorJoin.attachPair(pairs, vectors, idCol, vecCol)
      .select(col("psrc"), col("ra"), col("rb"),
        VectorOps.cosine(col("va"), col("vb")).as("s"))
      .groupBy(col("psrc").as("src"))
      .agg(collect_list(struct(col("ra"), col("rb"), col("s"))).as("ps"))
    val nbrs = e.groupBy("src")
      .agg(sort_array(collect_list(
        struct(col("rank"), col("dst"), col("sim")))).as("ns"))
    // the greedy kept-set fold: candidates in rank order, keep iff
    // closer to the anchor than to every kept neighbor (strict)
    val fold = udf { (ns: Seq[Row], ps: Seq[Row]) =>
      // a single-edge anchor has no neighbor pairs → null from the left join
      val pair = Option(ps).getOrElse(Seq.empty)
        .map(p => (p.getInt(0), p.getInt(1)) -> p.getDouble(2)).toMap
      val kept = scala.collection.mutable.ArrayBuffer[Int]()
      ns.sortBy(_.getInt(0)).map { n =>
        val r = n.getInt(0)
        val keep = kept.forall { kr =>
          // a missing pair sim means the vectors frame lacks an edge
          // endpoint — fail loudly with the contract, not a bare
          // NoSuchElementException from the map
          val s = pair.getOrElse((kr, r), throw new IllegalStateException(
            s"KnnPrune: no neighbor-pair sim for ranks ($kr, $r) — " +
              "every edge dst must be present in the vectors frame"))
          s < n.getDouble(2)
        }
        if (keep) kept += r
        (r, n.getLong(1), n.getDouble(2), keep)
      }
    }
    nbrs.join(nbrSims, Seq("src"), "left")
      .select(col("src"), explode(fold(col("ns"), col("ps"))).as("o"))
      .select(col("src"), col("o._1").as("rank"), col("o._2").as("dst"),
        col("o._3").as("sim"), col("o._4").as("kept"))
  }
}
