package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.SparkSpec

/** [[KnnPrune]] (X54): the greedy diversification fold against an
  * independent plain-Scala reference on a PLANTED hub corpus, plus the
  * claim that motivates the operator — the hub's in-degree strictly
  * drops while every anchor keeps its nearest neighbor. Geometry: two
  * tight clusters on the unit circle (around 0° and 90°, members at
  * ±1°/±2°) and one hub at 45°, moderately close to EVERYONE — the
  * classic high-dimensional failure shape q165 measures. Every anchor
  * lists the hub in its top-5, but for all but the hub-nearest member
  * of each cluster some kept same-cluster neighbor is closer to the
  * hub than the anchor is, so the rule prunes the hub edge. */
class KnnPruneSpec extends SparkSpec {

  private def pt(deg: Double): Array[Double] = {
    val r = math.toRadians(deg)
    Array(math.cos(r), math.sin(r))
  }
  private val pts: Seq[(Long, Array[Double])] =
    Seq(1L -> pt(-2), 2L -> pt(-1), 3L -> pt(1), 4L -> pt(2),
      11L -> pt(88), 12L -> pt(89), 13L -> pt(91), 14L -> pt(92),
      99L -> pt(45))
  private def cos(a: Array[Double], b: Array[Double]): Double = {
    val dot = a.zip(b).map { case (x, y) => x * y }.sum
    dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
  }

  // brute-force top-5 edges per anchor in (sim DESC, id) order — the
  // q162 layout the operator consumes
  private val edges: Seq[(Long, Int, Long, Double)] = pts.flatMap {
    case (a, va) =>
      pts.filter(_._1 != a)
        .map { case (b, vb) => (b, cos(va, vb)) }
        .sortBy { case (b, s) => (-s, b) }
        .take(5).zipWithIndex
        .map { case ((b, s), i) => (a, i + 1, b, s) }
  }

  // independent reference fold: keep iff strictly closer to the anchor
  // than to every already-kept neighbor
  private val reference: Set[(Long, Int, Long, Boolean)] = {
    val vOf = pts.toMap
    edges.groupBy(_._1).toSeq.flatMap { case (a, es) =>
      val kept = scala.collection.mutable.ArrayBuffer[Long]()
      es.sortBy(_._2).map { case (_, r, b, s) =>
        val keep = kept.forall(c => cos(vOf(c), vOf(b)) < s)
        if (keep) kept += b
        (a, r, b, keep)
      }
    }.toSet
  }

  test("diversify matches an independent reference fold and strictly " +
    "drops the planted hub's in-degree") {
    val vecSchema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("v", ArrayType(DoubleType))))
    val vecs = spark.createDataFrame(
      spark.sparkContext.parallelize(
        pts.map { case (i, v) => Row(i, v.toSeq) }, 2), vecSchema)
    val edgeSchema = StructType(Seq(
      StructField("src", LongType), StructField("rank", IntegerType),
      StructField("dst", LongType), StructField("sim", DoubleType)))
    val edgeDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        edges.map { case (a, r, b, s) => Row(a, r, b, s) }, 2), edgeSchema)

    val out = KnnPrune.diversify(edgeDf, vecs, "vec_id", "v")
      .select("src", "rank", "dst", "kept").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    assert(out == reference,
      s"engine != reference:\n+${(out -- reference).toSeq.sorted}\n-${(reference -- out).toSeq.sorted}")

    // every anchor keeps its rank-1 edge
    assert(out.filter(_._2 == 1).forall(_._4), "rank-1 edges must survive")
    // the hub's in-degree strictly drops — and by a lot: only the
    // hub-nearest member of each cluster retains its hub edge
    val before = edges.count(_._3 == 99L)
    val after = out.count(e => e._3 == 99L && e._4)
    assert(before == 8, s"planted geometry: every anchor lists the hub ($before)")
    assert(after < before, s"hub in-degree must strictly drop ($after vs $before)")
    assert(after == 2, s"only the hub-nearest member of each cluster keeps it ($after)")
  }
}
