package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for equi-joins (100 TB brief: "salting for skew, AQE
  * for runtime re-plan"). AQE's skew-join splitting handles most cases at
  * runtime; explicit salting remains the tool when one join key is so hot
  * that even split shuffle partitions overload single tasks (the
  * power-law user_id / document-source case in training pipelines).
  */
object Salting {

  /** Equi-join where the skewed (large) side's hot keys are spread over
    * `buckets` shuffle partitions and the other side is replicated
    * `buckets`× to meet them. Result is identical to
    * `skewed.join(other, skewed(key) === other(key), joinType)` for
    * inner/left joins.
    *
    * The salt derives from row content (xxhash64 over all columns), not
    * from rand() — deterministic under task retries.
    */
  def saltedJoin(
      skewed: DataFrame,
      other: DataFrame,
      key: String,
      buckets: Int,
      joinType: String = "inner"): DataFrame = {
    require(buckets > 0)
    // right/full would emit `buckets` copies of every unmatched
    // replicated-side row — enforce the documented inner/left scope
    require(Set("inner", "left", "leftouter", "left_outer", "leftsemi",
      "left_semi", "leftanti", "left_anti")
      .contains(joinType.toLowerCase.replace(" ", "")),
      s"saltedJoin is only correct for inner/left join types, got $joinType")
    val saltCol = "__salt"
    val salted = skewed.withColumn(saltCol,
      pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(buckets)).cast("int"))
    val replicated = other
      .withColumn(saltCol, explode(lit((0 until buckets).toArray)))
    salted.join(replicated,
        salted(key) === replicated(key) && salted(saltCol) === replicated(saltCol),
        joinType)
      .drop(saltCol)
      .drop(replicated(key))
  }
}
