package graft.queries

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}
import graft.functions.TextOps

/** Differential and property checks for the r12 operators whose oracle
  * replays only one data point: the Misra–Gries superset guarantee under
  * adversarial partitioning (q117), deletion-neighborhood blocking vs
  * brute-force edit distance (q118), the greedy MMR recurrence vs a
  * plain-Scala replay (q125), and MAD outlier counts vs a sorted-array
  * ground truth (q122). */
class AnalyticsOpsSpec extends SparkSpec {

  test("q117 Misra-Gries: candidate union covers every true heavy hitter " +
    "under any partitioning; recount output is partitioning-independent") {
    import spark.implicits._
    // skewed synthetic stream: two heavies among 500 rares
    val heavy = Seq.fill(300)("alpha") ++ Seq.fill(200)("beta")
    val rare = (0 until 500).map(i => s"rare$i")
    val stream = scala.util.Random.shuffle(heavy ++ rare ++ rare)
    val n = stream.size
    val truth = stream.groupBy(identity).view.mapValues(_.size)
      .filter { case (_, c) => c * 200 > n }.keySet.toSet
    assert(truth == Set("alpha", "beta"))
    for (parts <- Seq(1, 3, 17)) {
      val toks = spark.createDataset(stream).repartition(parts).as[String]
      val cand = TextOps.mgCandidates(toks, 400).distinct().collect().toSet
      assert(truth.subsetOf(cand),
        s"parts=$parts: MG candidates missed ${truth -- cand}")
      // sketch-then-recount end state is identical regardless of layout
      val recount = toks.toDF("w")
        .join(broadcast(cand.toSeq.toDF("w")), Seq("w"), "left_semi")
        .groupBy("w").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") * 200 > n)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      assert(recount == truth.map(t => (t, stream.count(_ == t).toLong)),
        s"parts=$parts: recount drifted")
    }
  }

  test("q118 deletion-neighborhood join == brute-force levenshtein-1 " +
    "(insertions and deletions included)") {
    val got = Registry.queries("q118_edit1_join")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val c = Tables(spark, sf, "customer")
      .select(col("c_custkey").cast("long").as("id"),
        col("c_custkey").cast("string").as("key"))
    val brute = c.as("a").join(c.as("b"), col("a.id") < col("b.id"))
      .filter(levenshtein(col("a.key"), col("b.key")) === 1)
      .select(col("a.id"), col("b.id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute, s"missing=${(brute -- got).take(5)} " +
      s"extra=${(got -- brute).take(5)}")
    // the data must actually exercise the indel path, not just Hamming
    val indel = brute.filter { case (a, b) =>
      a.toString.length != b.toString.length }
    assert(indel.nonEmpty, "fixture has no unequal-length pair")
  }

  test("q125 MMR: picks replay a plain-Scala greedy over the candidate pool") {
    val picks = Registry.queries("q125_mmr")(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).map(_._2)
    assert(picks.length == 4 && picks.distinct.length == 4)
    // rebuild the pool + pairwise sims exactly as the query does
    import graft.functions.VectorOps
    val emb = Tables(spark, sf, "embeddings")
      .withColumn("v", VectorOps.toDoubleVec(col("embedding")))
    val qv = emb.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val cands = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(qv))
      .select(col("vec_id"),
        round(VectorOps.cosine(col("v"), col("qv")), 4).as("rel"), col("v"))
      .orderBy(col("rel").desc, col("vec_id")).limit(20)
      .localCheckpoint(true)
    val rel = cands.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val sims = cands.as("a").join(cands.as("b"),
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        round(VectorOps.cosine(col("a.v"), col("b.v")), 4).as("s"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
      .toMap
    val sel = scala.collection.mutable.ArrayBuffer.empty[Long]
    sel += rel.toSeq.sortBy { case (id, r) => (-r, id) }.head._1
    while (sel.size < 4) {
      val next = rel.keysIterator.filterNot(sel.contains).map { d =>
        val ms = sel.map(s0 => sims((d, s0))).max
        val score = BigDecimal(0.7 * rel(d) - 0.3 * ms)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        (d, score)
      }.toSeq.sortBy { case (id, sc) => (-sc, id) }.head._1
      sel += next
    }
    assert(picks.toSeq == sel.toSeq,
      s"greedy replay picked ${sel.toSeq}, query picked ${picks.toSeq}")
  }

  test("q122 MAD outliers match a sorted-array ground truth per type") {
    def med(xs: Array[Double]): Double = {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }
    val rows = Tables(spark, sf, "events")
      .select(col("event_type"), round(col("value") * 100).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    val truth = rows.groupBy(_._1).map { case (tpe, vs) =>
      val cents = vs.map(_._2)
      val m = med(cents)
      val mad = med(cents.map(c => math.abs(c - m)))
      tpe -> ((cents.length.toLong,
        cents.count(c => math.abs(c - m) > 3 * mad).toLong, m, mad))
    }
    val got = Registry.queries("q122_mad_outliers")(spark, sf)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(got == truth, s"got=$got truth=$truth")
  }
}
