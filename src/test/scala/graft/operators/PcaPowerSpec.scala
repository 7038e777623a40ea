package graft.operators

import java.math.{BigDecimal => JBD, RoundingMode}

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Gates for the PCA power-iteration operator: the distributed moment
  * pass must equal a single-threaded in-memory accumulation exactly
  * (that bit-equality across partitionings is what the q171 oracle gate
  * rides on), and the analysis must actually FIND a planted dominant
  * direction — semantics, not just determinism. */
class PcaPowerSpec extends SparkSpec {

  private def dec12(x: Double): JBD =
    JBD.valueOf(x).setScale(12, RoundingMode.HALF_UP)

  private def toDf(vecs: Seq[Array[Double]], parts: Int) = {
    import spark.implicits._
    vecs.map(v => Tuple1(v.toSeq)).toDF("v").repartition(parts)
  }

  test("distributed exact moments ≡ in-memory accumulation, " +
    "bit for bit, across partitionings") {
    val rnd = new scala.util.Random(11)
    val d = 6
    val vecs = Seq.fill(40)(Array.fill(d)(rnd.nextDouble() * 2 - 1))
    val mRef = Array.fill(d)(JBD.ZERO)
    val sRef = Array.fill(d, d)(JBD.ZERO)
    vecs.foreach { v =>
      for (i <- 0 until d) {
        mRef(i) = mRef(i).add(dec12(v(i)))
        for (j <- i until d) sRef(i)(j) = sRef(i)(j).add(dec12(v(i) * v(j)))
      }
    }
    for (parts <- Seq(1, 3, 7)) {
      val (n, mu, mom) = PcaPower.moments(spark, toDf(vecs, parts), d)
      assert(n == 40L)
      for (i <- 0 until d) {
        assert(mu(i).compareTo(mRef(i)) == 0, s"parts=$parts mean[$i]")
        for (j <- i until d)
          assert(mom(i)(j).compareTo(sRef(i)(j)) == 0, s"parts=$parts S[$i][$j]")
      }
    }
  }

  test("a planted dominant direction is recovered: alignment, " +
    "explained-variance gap, and the sign convention") {
    val rnd = new scala.util.Random(23)
    val d = 16
    val u = {
      val raw = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      val nrm = math.sqrt(raw.map(x => x * x).sum)
      raw.map(_ / nrm)
    }
    // variance along u is ~9x the per-axis noise variance
    val vecs = Seq.fill(300) {
      val g = rnd.nextGaussian() * 3.0
      Array.tabulate(d)(i => u(i) * g + rnd.nextGaussian() * 0.1)
    }
    val (n, mu, mom) = PcaPower.moments(spark, toDf(vecs, 5), d)
    val st = PcaPower.analyze(n, mu, mom, d, iters = 24)
    val cos = st.pc1.zip(u).map { case (a, b) => a * b }.sum
    assert(math.abs(cos) > 0.98, s"pc1 misaligned with planted u: cos=$cos")
    assert(st.rayleigh1 / st.trace > 0.8,
      s"planted direction should dominate: evr1=${st.rayleigh1 / st.trace}")
    assert(st.rayleigh1 > 10 * st.rayleigh2,
      s"spectral gap lost: r1=${st.rayleigh1} r2=${st.rayleigh2}")
    val amax = st.pc1.indices.maxBy(i => math.abs(st.pc1(i)))
    assert(st.pc1(amax) > 0, "sign convention: largest |component| positive")
  }

  test("projectOut removes what it claims: corrected vectors are " +
    "mean-centered and orthogonal to the component (within round-9)") {
    import spark.implicits._
    val rnd = new scala.util.Random(41)
    val d = 8
    val vecs = Seq.tabulate(50) { i =>
      val g = rnd.nextGaussian() * 2.0
      (i.toLong, Array.tabulate(d)(k =>
        (if (k == 2) g else 0.0) + rnd.nextGaussian() * 0.05 + 0.5).toSeq)
    }
    val df = vecs.toDF("vec_id", "v").repartition(3)
    val (n, mu, mom) = PcaPower.moments(spark, df.select(col("v")), d)
    val st = PcaPower.analyze(n, mu, mom, d, iters = 24)
    val corrected = PcaPower.projectOut(spark, df, st.mean, st.pc1)
      .collect().map(r => r.getSeq[Double](1).toArray)
    // residual dot with the component: the round-9 of each corrected
    // element contributes d·5e-10, and pc1's own round-9 normalization
    // leaves |p|² = 1 ± O(d·1e-9), whose dt·(1−|p|²) term dominates —
    // bound generously at 1e-7, still 100× below any real component
    corrected.foreach { v =>
      val dot = v.zip(st.pc1).map { case (a, b) => a * b }.sum
      assert(math.abs(dot) < 1e-7, s"corrected vector not ⊥ pc1: $dot")
    }
    val meanAfter = Array.tabulate(d)(k => corrected.map(_(k)).sum / corrected.length)
    val meanNormAfter = math.sqrt(meanAfter.map(x => x * x).sum)
    val meanNormBefore = math.sqrt(st.mean.map(x => x * x).sum)
    assert(meanNormAfter < 1e-6 * math.max(1.0, meanNormBefore) + 1e-6,
      s"mean not removed: $meanNormAfter (before $meanNormBefore)")
  }

  test("analyzeTopK(k=2) ≡ analyze bit for bit (pc1, λ1, λ2) — the q171 " +
    "decision and the q178 application share one arithmetic") {
    val rnd = new scala.util.Random(59)
    val d = 10
    val vecs = Seq.fill(120)(Array.fill(d)(rnd.nextDouble() * 2 - 1))
    val (n, mu, mom) = PcaPower.moments(spark, toDf(vecs, 4), d)
    val st = PcaPower.analyze(n, mu, mom, d, iters = 24)
    val tk = PcaPower.analyzeTopK(n, mu, mom, d, iters = 24, k = 2)
    assert(tk.pcs(0).sameElements(st.pc1), "pc1 diverged")
    assert(tk.lams(0) == st.rayleigh1, "λ1 diverged")
    assert(tk.lams(1) == st.rayleigh2, "λ2 diverged")
    assert(tk.trace == st.trace, "trace diverged")
    assert(tk.mean.sameElements(st.mean), "mean diverged")
  }

  test("two planted orthogonal directions are both recovered and " +
    "projectOutK removes both") {
    import spark.implicits._
    val rnd = new scala.util.Random(67)
    val d = 12
    // orthonormal planted pair with well-separated variances (16x, 4x
    // the 0.01 noise variance)
    val u1 = Array.tabulate(d)(i => if (i % 2 == 0) 1.0 / math.sqrt(d / 2) else 0.0)
    val u2 = Array.tabulate(d)(i => if (i % 2 == 1) 1.0 / math.sqrt(d / 2) else 0.0)
    val vecs = Seq.tabulate(400) { i =>
      val g1 = rnd.nextGaussian() * 4.0
      val g2 = rnd.nextGaussian() * 2.0
      (i.toLong, Array.tabulate(d)(k =>
        u1(k) * g1 + u2(k) * g2 + rnd.nextGaussian() * 0.1).toSeq)
    }
    val df = vecs.toDF("vec_id", "v").repartition(5)
    val (n, mu, mom) = PcaPower.moments(spark, df.select(col("v")), d)
    val tk = PcaPower.analyzeTopK(n, mu, mom, d, iters = 24, k = 2)
    val c1 = tk.pcs(0).zip(u1).map { case (a, b) => a * b }.sum
    val c2 = tk.pcs(1).zip(u2).map { case (a, b) => a * b }.sum
    assert(math.abs(c1) > 0.98, s"component 1 misaligned: $c1")
    assert(math.abs(c2) > 0.98, s"component 2 misaligned: $c2")
    assert(tk.lams(0) > tk.lams(1) && tk.lams(1) > 10 * 0.01,
      s"λ ordering lost: ${tk.lams.toSeq}")
    val corrected = PcaPower.projectOutK(spark, df, tk.mean, tk.pcs)
      .collect().map(r => r.getSeq[Double](1).toArray)
    // variance along BOTH planted directions collapses to noise scale
    for ((u, tag) <- Seq((u1, "u1"), (u2, "u2"))) {
      val dots = corrected.map(v => v.zip(u).map { case (a, b) => a * b }.sum)
      val varU = dots.map(x => x * x).sum / dots.length
      assert(varU < 0.05, s"variance along $tag survives projection: $varU")
    }
  }

  test("isotropic noise reads as isotropic: evr1 stays near the 1/d floor") {
    val rnd = new scala.util.Random(37)
    val d = 16
    val vecs = Seq.fill(400)(Array.fill(d)(rnd.nextGaussian()))
    val (n, mu, mom) = PcaPower.moments(spark, toDf(vecs, 4), d)
    val st = PcaPower.analyze(n, mu, mom, d, iters = 24)
    val evr1 = st.rayleigh1 / st.trace
    assert(evr1 < 3.0 / d, s"isotropic corpus scored anisotropic: evr1=$evr1")
  }
}
