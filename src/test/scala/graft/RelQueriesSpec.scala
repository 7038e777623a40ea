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
}
