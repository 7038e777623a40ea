package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed full-batch trainer for a LINEAR quality classifier (X47)
  * — the model-based filtering step of a pretraining pipeline (CCNet /
  * fastText-style: distill an expensive quality rule into a cheap linear
  * scorer, then score the whole corpus at scan cost).
  *
  * Per gradient step: ONE map-only corpus pass — the weight vector is a
  * broadcast of `nf` doubles, each row computes its margin and
  * contributes (p − y)·x to per-partition gradient cells, and the
  * driver collects exactly `nf` numbers (the KMeansTrainer/PcaPower
  * posture; nothing grows with the corpus).
  *
  * Determinism — what lets q173's oracle RELEARN the same weights in
  * unrolled CTE rounds:
  *  - the margin z = Σ xⱼwⱼ and the gradient sums go through the
  *    decimal device (DECIMAL(28,12) casts — tie-free for binary
  *    doubles — summed exactly, order-independent);
  *  - the link is the RATIONAL sigmoid p = 0.5 + 0.5·z/(1+|z|)
  *    (Elliott'93's fast sigmoid): +, ×, ÷, |·| are IEEE-exact, so both
  *    engines compute bit-identical probabilities — a transcendental
  *    exp() would differ in the last ulp between libms and cascade
  *    across steps;
  *  - each weight update rounds to 9 dp.
  * So the learned weights are bit-identical across engines, partition
  * counts, and cluster sizes.
  */
object LinearTrainer {

  private def dec12(x: Double): JBD =
    JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)
  private def rnd9(x: Double): Double =
    JBD.valueOf(x).setScale(9, RoundingMode.HALF_UP).doubleValue

  /** The rational sigmoid link — IEEE-deterministic on every engine. */
  def sigmoid(z: Double): Double = 0.5 + 0.5 * z / (1 + math.abs(z))

  /** Decimal-exact margin of one row under `w`. */
  private def margin(x: Array[Double], w: Array[Double], nf: Int): Double = {
    var acc = JBD.ZERO
    var j = 0
    while (j < nf) { acc = acc.add(dec12(x(j) * w(j))); j += 1 }
    acc.doubleValue
  }

  /** `steps` full-batch gradient rounds from w = 0 over `feats`
    * (columns: `x` ARRAY<DOUBLE> of length `nf` — element 0 is the bias
    * input 1.0 — and `y` DOUBLE ∈ {0, 1}). Returns the learned
    * weights. `n` must be `feats.count()` (passed in so callers sharing
    * a checkpointed feature table pay the count once). */
  def fit(s: SparkSession, feats: DataFrame, nf: Int, n: Long,
      steps: Int, lr: Double): Array[Double] = {
    import s.implicits._
    var w = Array.fill(nf)(0.0)
    for (_ <- 0 until steps) {
      val bw = w
      val cells = feats.select(col("x"), col("y")).as[(Seq[Double], Double)]
        .mapPartitions { it =>
          val g = Array.fill(nf)(JBD.ZERO)
          var any = false
          it.foreach { case (xSeq, y) =>
            any = true
            val x = xSeq.toArray
            val p = sigmoid(margin(x, bw, nf))
            var j = 0
            while (j < nf) { g(j) = g(j).add(dec12((p - y) * x(j))); j += 1 }
          }
          if (!any) Iterator.empty
          else (0 until nf).iterator.map(j => (j, g(j)))
        }.toDF("j", "c")
        .groupBy("j").agg(sum("c").as("c"))
        .collect() // nf rows — metadata-scale
      val next = w.clone()
      cells.foreach { r =>
        val j = r.getInt(0)
        val g = r.getDecimal(1).doubleValue / n
        next(j) = rnd9(w(j) - lr * g)
      }
      w = next
    }
    w
  }

  /** Final-pass corpus stats under `w`: (kept = z ≥ 0, agreements with
    * the teacher label, Σy) — one more map-only pass, three longs per
    * partition. Σy over {0,1} doubles is exact at any order (integers
    * below 2⁵³), so no decimal detour is needed. */
  def stats(s: SparkSession, feats: DataFrame, nf: Int,
      w: Array[Double]): (Long, Long, Double) = {
    import s.implicits._
    val parts = feats.select(col("x"), col("y")).as[(Seq[Double], Double)]
      .mapPartitions { it =>
        var kept = 0L; var agree = 0L; var tpos = 0.0
        it.foreach { case (xSeq, y) =>
          val z = margin(xSeq.toArray, w, nf)
          if (z >= 0) kept += 1
          if ((z >= 0) == (y == 1.0)) agree += 1
          tpos += y
        }
        Iterator((kept, agree, tpos))
      }.collect() // one row per partition
    (parts.map(_._1).sum, parts.map(_._2).sum, parts.map(_._3).sum)
  }

  /** [[stats]] for BOTH slices of a train/eval split in ONE pass (r19
    * optimization round — the held-out queries ran two full-corpus
    * stats jobs over the same checkpointed feature table). `splitCol`
    * must be a boolean column: true = train slice. Returns
    * (train stats, eval stats), each a [[stats]] triple. */
  def statsSplit(s: SparkSession, feats: DataFrame, splitCol: org.apache.spark.sql.Column,
      nf: Int, w: Array[Double]): ((Long, Long, Double), (Long, Long, Double)) = {
    import s.implicits._
    val parts = feats.select(col("x"), col("y"), splitCol.cast("boolean"))
      .as[(Seq[Double], Double, Boolean)]
      .mapPartitions { it =>
        val k = new Array[Long](2); val a = new Array[Long](2)
        val tp = new Array[Double](2)
        it.foreach { case (xSeq, y, tr) =>
          val i = if (tr) 0 else 1
          val z = margin(xSeq.toArray, w, nf)
          if (z >= 0) k(i) += 1
          if ((z >= 0) == (y == 1.0)) a(i) += 1
          tp(i) += y
        }
        Iterator((k(0), a(0), tp(0), k(1), a(1), tp(1)))
      }.collect()
    ((parts.map(_._1).sum, parts.map(_._2).sum, parts.map(_._3).sum),
      (parts.map(_._4).sum, parts.map(_._5).sum, parts.map(_._6).sum))
  }
}
