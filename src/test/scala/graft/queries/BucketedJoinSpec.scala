package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale posture for fact-fact joins (SURVEY §2.3 J4, 100 TB brief):
  * bucketing both sides on the join key lets Spark plan a sort-merge join
  * with NO exchange — the co-location a 1000-executor cluster needs so a
  * lineitem ⋈ orders style join doesn't reshuffle 100 TB per query. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed fact-fact join plans without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")

    graft.Tables(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    graft.Tables(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("ord_b")

    // force the shuffle-family join path (at sf test scale Spark would
    // broadcast the small side, which proves nothing about co-location)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      bucketedAssertions()
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)

    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
  }

  private def bucketedAssertions(): Unit = {
    val joined = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("cnt"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not reshuffle either bucketed side: the only
    // allowed exchange is the post-join groupBy
    val joinSection = plan.split("SortMergeJoin|ShuffledHashJoin").drop(1)
    assert(joinSection.nonEmpty, s"expected a shuffle-family join:\n${plan.take(600)}")
    val exchangesBelowJoin = joinSection
      .map(s => "Exchange hashpartitioning".r.findAllIn(s).size).sum
    assert(exchangesBelowJoin == 0,
      s"bucketed join still shuffles:\n${plan.take(1200)}")

    // and it agrees with the plain (shuffling) join
    val plain = graft.Tables(spark, sf, "lineitem")
      .join(graft.Tables(spark, sf, "orders"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bucketed = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed == plain)
  }
}
