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
}
