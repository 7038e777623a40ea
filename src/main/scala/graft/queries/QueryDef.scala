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

/** Per-SparkSession memo for driver-built fixtures — the one shared
  * implementation of the "ConcurrentHashMap keyed by session +
  * computeIfAbsent" pattern the fixture objects repeat. Sessions are few
  * and long-lived under both the driver contract and the test suite, so
  * entries live for the JVM (no eviction; this is also the single place
  * to add it if that ever changes). */
private[queries] final class SessionMemo[T] {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, T]()
  def apply(s: SparkSession)(build: SparkSession => T): T =
    cache.computeIfAbsent(s, build(_))
}
