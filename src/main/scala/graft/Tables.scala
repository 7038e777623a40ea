package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated testdata tables (TESTDATA.md).
  *
  * Each table is a single parquet file under `sfDir`. Reads go through
  * Spark's vectorized parquet reader; filters/projections in the queries
  * are pushed down by Catalyst (verified via explain in the specs).
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 rejects by
      // default. Read nanos as LongType and truncate to a µs timestamp —
      // same truncation DuckDB applies, so oracle parity holds.
      // NOTE: the conf is session-wide and stays set — any later read of a
      // TIMESTAMP(NANOS) parquet in this session types it LongType. The
      // Verify/Bench/test session builders preset it so the behavior is
      // uniform from session start (ADVICE r1); it cannot be save/restored
      // around this call because the scan re-reads it at execution time.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions
          .expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every testdata table as a temp view (used by the SQL path). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
