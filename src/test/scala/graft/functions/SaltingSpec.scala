package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Salted joins must agree with the plain join and actually spread a hot
  * key over multiple shuffle partitions. */
class SaltingSpec extends SparkSpec {

  test("saltedJoin ≡ plain join on a skewed fact side") {
    import spark.implicits._
    // 10k rows where 90% share one hot key
    val fact = (0 until 10000)
      .map(i => (if (i % 10 == 0) i.toLong % 25 else 7L, i))
      .toDF("k", "v")
    val dim = (0L until 25L).map(k => (k, s"d$k")).toDF("k", "name")

    val plain = fact.join(dim, "k")
      .agg(count(lit(1)), sum("v"), countDistinct("name")).head()
    val salted = Salting.saltedJoin(fact, dim, "k", buckets = 8)
      .agg(count(lit(1)), sum("v"), countDistinct("name")).head()
    assert(salted == plain)

    // the hot key's rows really occupy several salt buckets
    val spread = fact.withColumn("s",
      pmod(xxhash64(fact.columns.map(col).toSeq: _*), lit(8)))
      .filter(col("k") === 7).select("s").distinct().count()
    assert(spread >= 4, s"hot key landed in only $spread salt buckets")

    // left join keeps unmatched rows exactly once
    val factWithOrphan = fact.union(Seq((999L, -1)).toDF("k", "v"))
    val left = Salting.saltedJoin(factWithOrphan, dim, "k", 8, "left")
    assert(left.count() == plain.getLong(0) + 1)
    assert(left.filter(col("k") === 999).head().isNullAt(2))
  }
}
