package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The two physical plans behind [[BandedAnn]]'s one candidate rule —
  * broadcast CSR probe within the byte budget, distributed equi-join +
  * value-distinct bounded top-K past it — must be ROW-EQUAL, or the
  * budget silently changes answers (the exact failure ADVICE r13 found
  * in BroadcastNn's dimension handling). */
class BandedAnnSpec extends SparkSpec {

  private def sigsDf(seed: Int, n: Int) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, rnd.nextLong()))
      .toDF("id", "sig").repartition(5)
  }

  test("broadcast probe ≡ declarative equi-join fallback on random " +
    "signatures, several (bands, bits, radius, k) configs") {
    for ((bands, bits, radius, k) <- Seq((8, 8, 2, 64), (4, 16, 1, 8),
        (8, 8, 0, 16), (16, 4, 1, 32))) {
      val df = sigsDf(seed = bands * 100 + radius, n = 300)
      val fast = BandedAnn.candidatesSelf(df, "id", "sig",
          bands, bits, radius, k)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val slow = BandedAnn.candidatesSelf(df, "id", "sig",
          bands, bits, radius, k, maxBroadcastBytes = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(fast == slow,
        s"bands=$bands bits=$bits radius=$radius k=$k: " +
          s"fastOnly=${(fast -- slow).take(5)} slowOnly=${(slow -- fast).take(5)}")
    }
  }

  test("rule replay: candidates are exactly min-band-ham ≤ radius cut " +
    "to top-k by (hamming, id), verified against plain Scala") {
    val bands = 8; val bits = 8; val radius = 2; val k = 5
    val df = sigsDf(seed = 7, n = 200)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1)))
    def bandHam(a: Long, b: Long, bd: Int): Int =
      java.lang.Long.bitCount(((a ^ b) >>> (bd * bits)) & ((1L << bits) - 1))
    val want = rows.flatMap { case (ia, sa) =>
      rows.filter(_._1 != ia)
        .filter { case (_, sb) =>
          (0 until bands).exists(bd => bandHam(sa, sb, bd) <= radius) }
        .map { case (ib, sb) => (ib, java.lang.Long.bitCount(sa ^ sb)) }
        .sortBy { case (ib, h) => (h, ib) }.take(k)
        .map { case (ib, _) => (ia, ib) }
    }.toSet
    val got = BandedAnn.candidatesSelf(df, "id", "sig", bands, bits,
        radius, k)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want,
      s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}")
  }

  test("neither plan contains a cross product; fallback's cut is an " +
    "aggregate, not a window") {
    val df = sigsDf(seed = 3, n = 100)
    for (budget <- Seq(512L << 20, 0L)) {
      val plan = BandedAnn.candidatesSelf(df, "id", "sig",
          maxBroadcastBytes = budget)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"), plan.take(600))
      assert(!plan.toLowerCase.contains("window"), plan.take(600))
    }
  }
}
