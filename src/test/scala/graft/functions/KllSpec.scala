package graft.functions

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.operators.SketchQuantiles

/** Gates for the mergeable KLL quantile sketch (G6 posture — no hash
  * oracle for an engine-specific sketch; the gates are measured):
  * rank-error bound vs exact order statistics, merge ≡ build under the
  * same bound, distributed build across partitionings, parquet
  * round-trip of the stored column with rolling-window estimates
  * tracking exact per-anchor percentiles, and byte determinism of the
  * deterministic-parity compaction. */
class KllSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.01"

  // rank tolerance for k=200: paper ~1% whp; deterministic parity and
  // small-n effects get margin. 3% of n is the contract this repo
  // documents for the device.
  private val eps = 0.03

  private def exactRank(sorted: Array[Double], v: Double): Long =
    sorted.count(_ <= v).toLong

  test("single-stream build: every estimated quantile lands within " +
    "eps·n of its target rank") {
    val rnd = new scala.util.Random(42)
    val xs = Array.fill(50000)(rnd.nextGaussian() * 100 + 10)
    val s = new KllState(200)
    xs.foreach(s.update)
    val sorted = xs.sorted
    for (q <- Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val est = s.quantile(q)
      val rank = exactRank(sorted, est)
      val target = math.ceil(q * xs.length).toLong
      assert(math.abs(rank - target) <= (eps * xs.length).toLong,
        s"q=$q est=$est rank=$rank target=$target")
    }
    // the extremes are exact: q=0 is the min, q=1 the max (weight-true
    // walk), both always survive compaction at the outer positions...
    // within one compaction's drift, so assert the rank bound holds
    assert(s.quantile(1.0) <= sorted.last + 1e-9)
    assert(s.quantile(0.0) >= sorted.head - 1e-9)
  }

  test("merge(sketch(A), sketch(B), ...) obeys the same rank bound as " +
    "one-stream build, and serialization round-trips bytes") {
    val rnd = new scala.util.Random(7)
    val xs = Array.fill(40000)(math.exp(rnd.nextGaussian())) // skewed
    val parts = xs.grouped(7919).toSeq
    val merged = new KllState(200)
    parts.foreach { p =>
      val s = new KllState(200)
      p.foreach(s.update)
      // round-trip through bytes, as a stored column would
      merged.mergeWith(KllState.deserialize(s.serialize()))
    }
    assert(merged.n == xs.length)
    val sorted = xs.sorted
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val rank = exactRank(sorted, merged.quantile(q))
      val target = math.ceil(q * xs.length).toLong
      assert(math.abs(rank - target) <= (eps * xs.length).toLong,
        s"q=$q rank=$rank target=$target")
    }
    // deterministic parity ⇒ identical bytes for an identical build
    val again = new KllState(200)
    parts.foreach { p =>
      val s = new KllState(200)
      p.foreach(s.update)
      again.mergeWith(KllState.deserialize(s.serialize()))
    }
    assert(java.util.Arrays.equals(merged.serialize(), again.serialize()))
  }

  test("distributed build (Kll.sketch UDAF) respects the bound under " +
    "different partitionings") {
    import spark.implicits._
    val rnd = new scala.util.Random(3)
    val xs = Seq.fill(30000)(rnd.nextDouble() * 1000)
    val sorted = xs.sorted.toArray
    for (parts <- Seq(1, 13)) {
      val bytes = xs.toDF("v").repartition(parts)
        .agg(Kll.sketch(col("v")).as("s"))
        .head().getAs[Array[Byte]](0)
      val s = KllState.deserialize(bytes)
      assert(s.n == xs.length)
      for (q <- Seq(0.25, 0.5, 0.95)) {
        val rank = exactRank(sorted, s.quantile(q))
        val target = math.ceil(q * xs.length).toLong
        assert(math.abs(rank - target) <= (eps * xs.length).toLong,
          s"parts=$parts q=$q rank=$rank target=$target")
      }
    }
  }

  test("stored daily sketches: parquet round-trip; rolling p50/p90 " +
    "track exact per-anchor window percentiles; events never re-read") {
    val events = Tables(spark, sf01, "events")
    val daily = SketchQuantiles.dailySketches(events)
    val dir = java.nio.file.Files
      .createTempDirectory("graft-kll-mv").toString
    daily.write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    val roll = SketchQuantiles.rollingQuantiles(stored)
    val scans = roll.queryExecution.sparkPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec =>
        s.relation.location.rootPaths.mkString(",")
    }
    assert(scans.nonEmpty && scans.forall(_.contains(dir)), scans.toString)
    val got = roll.collect()
      .map(r => r.getDate(0).toString ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    // exact ground truth: per-anchor 7-day value multisets via the same
    // fan-out, exact percentile
    val exact = events
      .select(col("ts").cast("date").as("d"),
        col("value").cast("double").as("v"))
      .select(col("v"), explode(sequence(lit(0), lit(6))).as("i"), col("d"))
      .select(date_add(col("d"), col("i")).as("day"), col("v"))
      .groupBy("day")
      .agg(count(lit(1)).as("n"),
        expr("percentile(v, 0.5D)").as("p50"),
        expr("percentile(v, 0.9D)").as("p90"),
        sort_array(collect_list("v")).as("vs"))
      .collect()
      .map(r => r.getDate(0).toString ->
        ((r.getLong(1), r.getSeq[Double](4).toArray)))
      .toMap
    // drop the warm-up/tail anchors outside the sketch table's range
    got.foreach { case (day, (p50, p90)) =>
      exact.get(day).foreach { case (n, vs) =>
        for ((q, est) <- Seq((0.5, p50), (0.9, p90))) {
          val rank = vs.count(_ <= est).toLong
          val target = math.ceil(q * n).toLong
          assert(math.abs(rank - target) <= math.max(2L, (eps * n).toLong),
            s"$day q=$q est=$est rank=$rank target=$target n=$n")
        }
      }
    }
    assert(got.nonEmpty)
  }
}
