package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine operator exposed through the driver contract:
  * a Spark implementation plus (when SQL-expressible) an equivalent
  * DuckDB oracle statement over the same parquet tables.
  *
  * Column names/aliases MUST match between `run`'s output and `oracle` —
  * the driver sorts columns by name before hashing.
  */
final case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)
