package graft.queries

import graft.SparkSpec

/** Plain-Scala ground truths for the r15 decision/diagnostic queries.
  * Their DuckDB oracles REPLAY the same declarative formulation (the
  * lead()-window interval union, the self-join mutuality rule, the
  * distinct-fraction arithmetic), so a formulation bug would hash GREEN
  * on both engines — these brute-force replays pin the INTENT: covered
  * positions via an explicit boolean array, graph stats via naive set
  * scans, repetition fractions via plain collections. */
class DecisionOpsSpec extends SparkSpec {

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  private lazy val docs: Array[(Long, Array[String], Long)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0),
        r.getString(1).toLowerCase.split(" ", -1), r.getLong(2)))
      .sortBy(_._1)

  test("q164 span coverage: engine rows equal an explicit boolean-array " +
    "interval union over brute-force dup spans") {
    // brute force: every 10-token window, spans present in >= 2 docs,
    // per-doc covered positions marked in an actual array
    val spansByDoc = docs.map { case (id, t, _) =>
      id -> (if (t.length >= 10)
        (0 to t.length - 10).map(i => (i, t.slice(i, i + 10).mkString(" ")))
      else Seq.empty)
    }.toMap
    val dup = spansByDoc.toSeq
      .flatMap { case (id, sp) => sp.map(_._2).distinct.map(_ -> id) }
      .groupBy(_._1).filter(_._2.size >= 2).keySet
    val want = docs.flatMap { case (id, t, nchars) =>
      val marked = new Array[Boolean](t.length)
      spansByDoc(id).foreach { case (i, s) =>
        if (dup(s)) (i until i + 10).foreach(marked(_) = true)
      }
      val covered = marked.count(identity)
      if (covered == 0) None
      else {
        val drop = covered >= 0.5 * t.length
        Some((id, t.length.toLong, covered.toLong,
          round4(covered * 1.0 / t.length), drop,
          if (drop) nchars else 0L))
      }
    }.toSeq
    val got = Registry.queries("q164_span_coverage")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getBoolean(4), r.getLong(5))).toSeq
    assert(got == want,
      s"missing=${(want.toSet -- got.toSet).take(3)} " +
        s"extra=${(got.toSet -- want.toSet).take(3)}")
    // the decision column must actually decide something on this corpus
    assert(got.exists(_._5) || got.isEmpty)
  }

  test("q165 graph health: metrics equal naive set scans over the " +
    "collected q162 edge list") {
    val edges = Registry.queries("q162_knn_graph")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq // (src, dst)
    val indeg = edges.groupBy(_._2).map { case (_, es) => es.size }
    val hist = indeg.groupBy(identity).map { case (d, xs) =>
      ("in_degree", d.toLong, xs.size.toLong) }.toSeq
    val eset = edges.toSet
    val mutual = edges.count { case (s, d) => s < d && eset((d, s)) }
    val srcs = edges.map(_._1).toSet
    val dsts = edges.map(_._2).toSet
    val want = (hist ++ Seq(
      ("edges", 0L, edges.size.toLong),
      ("mutual_pairs", 0L, mutual.toLong),
      ("isolated_sources", 0L, (srcs -- dsts).size.toLong)))
      .sortBy(x => (x._1, x._2))
    val got = Registry.queries("q165_knn_graph_health")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want, s"got=${got.take(8)} want=${want.take(8)}")
  }

  test("q166 repetition signals: fractions equal plain-collection " +
    "counts; the verdict flags a non-trivial, non-total subset") {
    val want = docs.map { case (id, t, _) =>
      val ntok = t.length
      val top1 = t.groupBy(identity).map(_._2.size).max * 1.0 / ntok
      def dupFrac(n: Int): Double =
        if (ntok < n) 0.0
        else {
          val gs = (0 to ntok - n).map(i => t.slice(i, i + n).mkString(" "))
          1.0 - gs.distinct.size * 1.0 / gs.size
        }
      val d2 = dupFrac(2)
      (id, ntok.toLong, round4(top1), round4(d2), round4(dupFrac(3)),
        top1 > 0.15 || d2 > 0.1)
    }.toSeq
    val got = Registry.queries("q166_repetition_signals")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getBoolean(5))).toSeq
    assert(got == want,
      s"first diff=${got.zip(want).find(p => p._1 != p._2)}")
    val flagged = got.count(_._6)
    assert(flagged > 0 && flagged < got.size,
      s"verdict degenerate: $flagged of ${got.size} flagged")
  }
}
