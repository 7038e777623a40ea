package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed PCA by power iteration over EXACT second moments (X46) —
  * the embedding-anisotropy audit (Mu & Viswanath ICLR'18
  * "all-but-the-top"; Ethayarajh EMNLP'19): how much of the corpus
  * embedding variance a single direction explains. evr1 ≈ 1/d says the
  * space is isotropic (healthy for cosine retrieval); evr1 ≫ 1/d says a
  * dominant common direction is inflating every similarity score and
  * should be projected out before ANN indexing.
  *
  * Architecture: ONE corpus pass accumulates the d×(d+3)/2 exact decimal
  * moment cells (count, per-dim sums, upper-triangle cross products) in
  * mapPartitions — the shuffle after partial aggregation carries
  * partitions × O(d²) cells and the driver collects O(d²) numbers, so
  * nothing downstream of the single scan grows with the corpus (the
  * BpeTrainer/KMeansTrainer posture). Everything after — covariance,
  * power iterations, Rayleigh quotients, deflation — is d²-scale driver
  * math. 64×64 here; even 4096-dim embeddings stay ≤ 8.4M driver cells.
  *
  * Determinism (what lets q171's oracle REPLAY the whole analysis in
  * DuckDB as unrolled CTE rounds): every cross-row aggregate goes
  * through the decimal device — each double term is cast to
  * DECIMAL(28,12) (tie-free for binary doubles: a double can never sit
  * exactly on a decimal half-grid point), summed exactly
  * (order-independent), and each iteration's vector is rounded to 9
  * decimals — so both engines walk bit-identical iterates regardless of
  * partitioning, join order, or cluster size.
  *
  * Honest-estimate note: after a FIXED number of power rounds the
  * Rayleigh quotients are LOWER BOUNDS on λ1 (and, post-deflation, an
  * estimate of λ2) — converged only when the spectral gap is real. On a
  * near-flat spectrum (this synthetic corpus) rayleigh2 can exceed
  * rayleigh1; that is itself the diagnostic answer ("no dominant
  * direction"), and the gate compares the deterministic estimates, not
  * a convergence claim. PcaPowerSpec plants an anisotropic corpus and
  * proves the planted direction is recovered.
  */
object PcaPower {

  final case class Stats(mean: Array[Double], pc1: Array[Double],
      rayleigh1: Double, rayleigh2: Double, trace: Double)

  private def dec12(x: Double): JBD =
    JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)
  private def rnd9(x: Double): Double =
    JBD.valueOf(x).setScale(9, RoundingMode.HALF_UP).doubleValue
  def rnd(x: Double, scale: Int): Double =
    JBD.valueOf(x).setScale(scale, RoundingMode.HALF_UP).doubleValue

  /** One corpus pass over `e` (column `v` ARRAY<DOUBLE>): exact decimal
    * (count, Σxᵢ, Σxᵢxⱼ for i ≤ j) cells, partially aggregated per
    * partition, reduced by an exact decimal sum, collected (O(d²)). */
  def moments(s: SparkSession, e: DataFrame, d: Int)
      : (Long, Array[JBD], Array[Array[JBD]]) = {
    import s.implicits._
    val cells = e.select(col("v")).as[Seq[Double]].mapPartitions { it =>
      val mSum = Array.fill(d)(JBD.ZERO)
      val sSum = Array.fill(d, d)(JBD.ZERO) // upper triangle used
      var cnt = 0L
      it.foreach { vSeq =>
        val v = vSeq.toArray
        cnt += 1
        var i = 0
        val lim = math.min(d, v.length)
        while (i < lim) {
          mSum(i) = mSum(i).add(dec12(v(i)))
          var j = i
          while (j < lim) {
            sSum(i)(j) = sSum(i)(j).add(dec12(v(i) * v(j)))
            j += 1
          }
          i += 1
        }
      }
      if (cnt == 0) Iterator.empty
      else Iterator((-1, -1, JBD.valueOf(cnt))) ++
        (0 until d).iterator.flatMap { i =>
          Iterator((i, -1, mSum(i))) ++
            (i until d).iterator.map(j => (i, j, sSum(i)(j)))
        }
    }.toDF("i", "j", "c")
      .groupBy("i", "j").agg(sum("c").as("c"))
      .collect()
    var n = 0L
    val mu = Array.fill(d)(JBD.ZERO)
    val mom = Array.fill(d, d)(JBD.ZERO)
    cells.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDecimal(2))
      if (i == -1) n = c.longValueExact
      else if (j == -1) mu(i) = c
      else mom(i)(j) = c
    }
    (n, mu, mom)
  }

  /** Driver-side analysis mirroring q171's oracle expression for
    * expression: covariance from the exact moments, `iters` power
    * rounds (start = the exactly-representable 1/√d = 0.125 for d=64),
    * sign fixed at the largest-|component| (lowest index on ties),
    * Rayleigh quotient, rank-1 deflation, second run. */
  def analyze(n: Long, muSum: Array[JBD], mom: Array[Array[JBD]],
      d: Int, iters: Int): Stats = {
    val mu = Array.tabulate(d)(i => muSum(i).doubleValue / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      mom(a)(b).doubleValue / n - mu(a) * mu(b)
    }

    def matvecRound(m: Array[Array[Double]], x: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var acc = JBD.ZERO
        var j = 0
        while (j < d) { acc = acc.add(dec12(m(i)(j) * x(j))); j += 1 }
        rnd9(acc.doubleValue)
      }
    def normalize(w: Array[Double]): Array[Double] = {
      var acc = JBD.ZERO
      var i = 0
      while (i < d) { acc = acc.add(dec12(w(i) * w(i))); i += 1 }
      val nv = math.sqrt(acc.doubleValue)
      w.map(x => rnd9(x / nv))
    }
    def powerRun(m: Array[Array[Double]]): Array[Double] = {
      var x = Array.fill(d)(0.125)
      for (_ <- 0 until iters) x = normalize(matvecRound(m, x))
      x
    }
    def rayleigh(m: Array[Array[Double]], x: Array[Double]): Double = {
      val y = matvecRound(m, x)
      var acc = JBD.ZERO
      var i = 0
      while (i < d) { acc = acc.add(dec12(x(i) * y(i))); i += 1 }
      rnd9(acc.doubleValue)
    }

    val x1 = powerRun(cov)
    var best = 0
    for (i <- 1 until d) if (math.abs(x1(i)) > math.abs(x1(best))) best = i
    val sign = if (x1(best) < 0) -1.0 else 1.0
    val pc1 = x1.map(_ * sign)
    val r1 = rayleigh(cov, pc1)
    var trAcc = JBD.ZERO
    for (i <- 0 until d) trAcc = trAcc.add(dec12(cov(i)(i)))
    val trace = trAcc.doubleValue
    val deflated = Array.tabulate(d, d)((i, j) => cov(i)(j) - r1 * pc1(i) * pc1(j))
    val r2 = rayleigh(deflated, powerRun(deflated))
    Stats(mu, pc1, r1, r2, trace)
  }

  final case class TopK(mean: Array[Double], pcs: Array[Array[Double]],
      lams: Array[Double], trace: Double)

  /** Top-`k` components by repeated power runs with per-component
    * Rayleigh deflation (VERDICT r16 #6 — the multi-component
    * all-but-the-top): each component is sign-fixed at its
    * largest-|entry| (lowest index on ties; sign does not affect the
    * deflation outer product, so fixing it is output canonicalization,
    * not a numerical choice), its Rayleigh quotient taken against the
    * CURRENT deflated matrix, and the matrix deflated by λ·ppᵀ before
    * the next run. k = 2 reproduces [[analyze]]'s pc1/rayleigh1/
    * rayleigh2 exactly (same rounds, same decimal device — PcaPowerSpec
    * pins the equality), so the q171 decision and the q178 application
    * share one arithmetic. Driver math only; same fixed-round
    * lower-bound caveat as [[analyze]]. */
  def analyzeTopK(n: Long, muSum: Array[JBD], mom: Array[Array[JBD]],
      d: Int, iters: Int, k: Int): TopK = {
    val mu = Array.tabulate(d)(i => muSum(i).doubleValue / n)
    var m = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      mom(a)(b).doubleValue / n - mu(a) * mu(b)
    }
    def matvecRound(mm: Array[Array[Double]], x: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var acc = JBD.ZERO
        var j = 0
        while (j < d) { acc = acc.add(dec12(mm(i)(j) * x(j))); j += 1 }
        rnd9(acc.doubleValue)
      }
    def normalize(w: Array[Double]): Array[Double] = {
      var acc = JBD.ZERO
      var i = 0
      while (i < d) { acc = acc.add(dec12(w(i) * w(i))); i += 1 }
      val nv = math.sqrt(acc.doubleValue)
      w.map(x => rnd9(x / nv))
    }
    var trAcc = JBD.ZERO
    for (i <- 0 until d) trAcc = trAcc.add(dec12(m(i)(i)))
    val trace = trAcc.doubleValue
    val pcs = Array.ofDim[Array[Double]](k)
    val lams = new Array[Double](k)
    for (c <- 0 until k) {
      var x = Array.fill(d)(0.125)
      for (_ <- 0 until iters) x = normalize(matvecRound(m, x))
      var best = 0
      for (i <- 1 until d) if (math.abs(x(i)) > math.abs(x(best))) best = i
      val sign = if (x(best) < 0) -1.0 else 1.0
      val pc = x.map(_ * sign)
      val y = matvecRound(m, pc)
      var acc = JBD.ZERO
      for (i <- 0 until d) acc = acc.add(dec12(pc(i) * y(i)))
      val lam = rnd9(acc.doubleValue)
      pcs(c) = pc; lams(c) = lam
      val prev = m
      m = Array.tabulate(d, d)((i, j) => prev(i)(j) - lam * pc(i) * pc(j))
    }
    TopK(mu, pcs, lams, trace)
  }

  /** ALL-BUT-THE-TOP correction (Mu & Viswanath ICLR'18): x′ = x − μ −
    * ((x − μ)·p)·p — mean-center, then remove the dominant component.
    * ONE map-only corpus pass (no shuffle; μ and p are 2d broadcast
    * doubles); the projection coefficient goes through the decimal
    * device and every corrected component rounds to 9 dp, so the
    * corrected table is bit-identical on both engines — the oracle
    * rebuilds it from its own relearned μ/p (q172). Input/output
    * columns: (vec_id LONG, v ARRAY<DOUBLE>). */
  def projectOut(s: SparkSession, e: DataFrame,
      mu: Array[Double], p: Array[Double]): DataFrame = {
    import s.implicits._
    val d = p.length
    e.select(col("vec_id").cast("long"), col("v")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (id, vSeq) =>
          val v = vSeq.toArray
          val lim = math.min(d, v.length)
          var acc = JBD.ZERO
          var i = 0
          while (i < lim) { acc = acc.add(dec12((v(i) - mu(i)) * p(i))); i += 1 }
          val dt = acc.doubleValue
          val out = new Array[Double](lim)
          i = 0
          while (i < lim) { out(i) = rnd9(v(i) - mu(i) - dt * p(i)); i += 1 }
          (id, out.toSeq)
        }
      }.toDF("vec_id", "v")
  }

  /** Multi-component all-but-the-top: x′ = x − μ − Σ_c ((x−μ)·p_c)·p_c
    * with ALL coefficients taken against the RAW centered vector (the
    * components are near-orthogonal after deflation, and the joint rule
    * is what the oracle can replay as two aggregates: per-component
    * decimal dot, then a decimal sum of dt_c·p_c[i] per position — one
    * rounding at the end). Still ONE map-only pass; μ and the k
    * components are (k+1)·d broadcast doubles. */
  def projectOutK(s: SparkSession, e: DataFrame,
      mu: Array[Double], pcs: Array[Array[Double]]): DataFrame = {
    import s.implicits._
    val d = mu.length
    val k = pcs.length
    e.select(col("vec_id").cast("long"), col("v")).as[(Long, Seq[Double])]
      .mapPartitions { it =>
        it.map { case (id, vSeq) =>
          val v = vSeq.toArray
          val lim = math.min(d, v.length)
          val dt = new Array[Double](k)
          var c = 0
          while (c < k) {
            var acc = JBD.ZERO
            var i = 0
            while (i < lim) {
              acc = acc.add(dec12((v(i) - mu(i)) * pcs(c)(i))); i += 1
            }
            dt(c) = acc.doubleValue
            c += 1
          }
          val out = new Array[Double](lim)
          var i = 0
          while (i < lim) {
            var acc = JBD.ZERO
            c = 0
            while (c < k) { acc = acc.add(dec12(dt(c) * pcs(c)(i))); c += 1 }
            out(i) = rnd9(v(i) - mu(i) - acc.doubleValue)
            i += 1
          }
          (id, out.toSeq)
        }
      }.toDF("vec_id", "v")
  }
}
