package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.LlmQueries

/** Differential gate for the hash-exact Lloyd trainer (X45): the
  * Spark-learned codebook must equal an INDEPENDENT in-memory trainer's
  * bit for bit — same seed layout, same cosine assignment with the
  * (sim DESC, cid ASC) tie order, same decimal-exact mean with the same
  * two roundings — because that bit-equality is exactly what the q169/
  * q170 oracle gate relies on cross-engine. Plus the empty-bucket rule:
  * a centroid no vector chooses must keep its previous value. */
class KMeansSpec extends SparkSpec {

  private def cosineAssignRef(v: Array[Double], cents: Array[Array[Double]])
      : Int = {
    var vn = 0.0; var i = 0
    while (i < v.length) { vn += v(i) * v(i); i += 1 }
    val vNorm = math.sqrt(vn)
    var best = 0; var bestSim = Double.NegativeInfinity
    var c = 0
    while (c < cents.length) {
      val ct = cents(c)
      var cn = 0.0; var j = 0
      while (j < ct.length) { cn += ct(j) * ct(j); j += 1 }
      val cNorm = math.sqrt(cn)
      var dot = 0.0; j = 0
      val n = math.min(v.length, ct.length)
      while (j < n) { dot += v(j) * ct(j); j += 1 }
      val sim = if (vNorm == 0 || cNorm == 0) -2.0 else dot / (vNorm * cNorm)
      if (sim > bestSim) { bestSim = sim; best = c } // first wins ties
      c += 1
    }
    best
  }

  /** In-memory Lloyd with the trainer's exact update semantics:
    * sum(CAST(x AS DECIMAL(28,12))) is BigDecimal setScale(12, HALF_UP)
    * summed exactly; the decimal→double cast is BigDecimal.doubleValue
    * (what Spark's Decimal.toDouble does); round(·, 9) is setScale(9,
    * HALF_UP). */
  private def trainRef(vecs: Seq[(Long, Array[Double])],
      seeds: Array[Array[Double]], iters: Int): Array[Array[Double]] = {
    var cents = seeds.map(_.clone)
    for (_ <- 0 until iters) {
      val byBucket = vecs.groupBy { case (_, v) => cosineAssignRef(v, cents) }
      val next = cents.map(_.clone)
      byBucket.foreach { case (c, members) =>
        val dims = cents(c).length
        for (d <- 0 until dims) {
          // the oracle's fixed 1..dims grid: SUM skips members shorter
          // than d (their cell is NULL), the denominator is the bucket
          // MEMBER count; an all-NULL cell keeps its previous value
          val present = members.filter { case (_, v) => d < v.length }
          if (present.nonEmpty) {
            val sum = present.map { case (_, v) =>
              BigDecimal(v(d)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
            }.sum
            val mean = sum.toDouble / members.size
            next(c)(d) =
              BigDecimal(mean).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
          }
        }
      }
      cents = next
    }
    cents
  }

  test("Spark-learned codebook ≡ independent in-memory trainer, " +
    "bit for bit, over several (k, iters) configs") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val dim = 5
    val vecs = (0 until 30).map(i =>
      (i.toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1)))
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v").repartition(4)
    for ((k, iters) <- Seq((3, 1), (3, 2), (5, 3))) {
      val seeds = vecs.take(k).map(_._2.clone).toArray
      val got = KMeansTrainer.train(df, seeds, iters)(
        (corpus, cents) => LlmQueries.ivfAssignCarry(spark, corpus, cents))
      val want = trainRef(vecs, seeds, iters)
      for (c <- 0 until k)
        assert(got(c).sameElements(want(c)),
          s"k=$k iters=$iters centroid $c: " +
            s"got=${got(c).mkString(",")} want=${want(c).mkString(",")}")
      assert(got.zip(seeds).exists { case (a, b) => !a.sameElements(b) },
        s"k=$k iters=$iters: training left every centroid at its seed")
    }
  }

  test("fuzz: trainer ≡ in-memory reference, bit for bit, across random " +
    "(n, d, k, iters, partitioning)") {
    import spark.implicits._
    for (seed <- 1 to 6) {
      val r = new scala.util.Random(seed * 31)
      val d = 2 + r.nextInt(6)
      val n = 20 + r.nextInt(60)
      val k = 2 + r.nextInt(4)
      val iters = 1 + r.nextInt(3)
      val parts = 1 + r.nextInt(7)
      val vecs = (0 until n).map(i =>
        (i.toLong, Array.fill(d)(r.nextDouble() * 4 - 2)))
      val df = vecs.map { case (id, v) => (id, v.toSeq) }
        .toDF("vec_id", "v").repartition(parts)
      val seeds = vecs.take(k).map(_._2.clone).toArray
      val got = KMeansTrainer.train(df, seeds, iters)(
        (c, cs) => LlmQueries.ivfAssignCarry(spark, c, cs))
      val want = trainRef(vecs, seeds, iters)
      for (c <- 0 until k)
        assert(got(c).sameElements(want(c)),
          s"seed=$seed d=$d k=$k iters=$iters parts=$parts centroid=$c")
    }
  }

  test("ragged short/long vectors divide by the bucket MEMBER count, " +
    "matching the oracle's fixed-grid semantics (ADVICE r16 low)") {
    import spark.implicits._
    val r = new scala.util.Random(97)
    val dim = 4
    // a third of the vectors are SHORT (2 dims), a few are over-long
    // (6 dims — tail positions must be ignored, not crash)
    val vecs = (0 until 24).map { i =>
      val len = if (i % 3 == 0) 2 else if (i % 7 == 0) 6 else dim
      (i.toLong, Array.fill(len)(r.nextDouble() * 2 - 1))
    }
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v").repartition(5)
    val seeds = vecs.filter(_._2.length == dim).take(3)
      .map(_._2.clone).toArray
    val got = KMeansTrainer.train(df, seeds, iters = 2)(
      (c, cs) => LlmQueries.ivfAssignCarry(spark, c, cs))
    val want = trainRef(vecs, seeds, 2)
    for (c <- seeds.indices)
      assert(got(c).sameElements(want(c)),
        s"centroid $c: got=${got(c).mkString(",")} want=${want(c).mkString(",")}")
  }

  test("a Lloyd round is ONE corpus scan: the mean plan contains no " +
    "join back to the vector table (VERDICT r16 wrong #1)") {
    import spark.implicits._
    val vecs = (0 until 16).map(i => (i.toLong, Seq.fill(4)(i * 0.1)))
    val df = vecs.toDF("vec_id", "v")
    val seeds = Array(Array(0.1, 0.1, 0.1, 0.1), Array(1.0, 1.0, 1.0, 1.0))
    val plan = KMeansTrainer
      .roundMeans(LlmQueries.ivfAssignCarry(spark, df, seeds), 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"round plan joins the corpus:\n$plan")
    assert(plan.contains("HashAggregate"), s"no partial aggregate:\n$plan")
  }

  test("empty buckets keep their previous centroid") {
    import spark.implicits._
    val dim = 4
    // every vector points into the all-positive orthant; the second seed
    // points the opposite way, so no vector ever chooses it
    val vecs = (0 until 12).map(i =>
      (i.toLong, Array.tabulate(dim)(d => 1.0 + 0.01 * (i + d))))
    val df = vecs.map { case (id, v) => (id, v.toSeq) }
      .toDF("vec_id", "v")
    val farSeed = Array.fill(dim)(-1.0)
    val seeds = Array(vecs.head._2.clone, farSeed.clone)
    val got = KMeansTrainer.train(df, seeds, iters = 2)(
      (corpus, cents) => LlmQueries.ivfAssignCarry(spark, corpus, cents))
    assert(got(1).sameElements(farSeed),
      s"empty bucket's centroid moved: ${got(1).mkString(",")}")
    assert(!got(0).sameElements(seeds(0)),
      "the occupied bucket's centroid never moved")
  }
}
