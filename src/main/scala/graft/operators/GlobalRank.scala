package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Fact-scale GLOBAL ranking without a single-partition window — q136's
  * two-pass prefix-sum generalized into the shared device (VERDICT r12
  * next-step #6): `row_number()/ntile()/SUM() OVER (ORDER BY …)` with no
  * PARTITION BY moves the whole input through ONE task (Spark even warns
  * "No Partition Defined … serious performance degradation"), which is
  * fine for a dimension table and fatal for a fact table. The classic
  * distributed spelling instead: (1) RANGE-repartition on the total sort
  * key, so partition boundaries respect the global order; (2) windows
  * partitioned BY PARTITION ID compute per-partition ranks/running sums;
  * (3) a |partitions|-row offset table (cumulative counts/sums of
  * partition totals) broadcasts back, and per-partition values shift by
  * their partition's offset. The only single-partition window left runs
  * over the offset table — |partitions| rows by construction, never the
  * data. Correctness needs a TOTAL sort key (tie-broken to uniqueness):
  * with a total order, partition boundaries cannot reorder equal keys
  * and the global rank is exact, not approximate. */
object GlobalRank {

  /** Append `grank` (global 1-based row number over `sortCols`) and,
    * when `sumCol` is set, `gcum` (inclusive running sum of it in the
    * same order) to `df` — both exactly what the single-partition
    * window would produce, computed with no task ever holding more
    * than one range partition. `partitions` sizes the range split
    * (default: the session shuffle parallelism). */
  def withGlobalRank(df: DataFrame, sortCols: Seq[Column],
                     sumCol: Option[Column] = None,
                     partitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "global rank needs a total sort order")
    val p = if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    val ranged = df
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val w = Window.partitionBy("__pid").orderBy(sortCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val within = ranged
      .withColumn("__rn_in", count(lit(1)).over(w))
      .withColumn("__cum_in",
        sumCol.map(c => sum(c).over(w)).getOrElse(lit(0L)))
    // the offset table: one row per RANGE PARTITION — the single-
    // partition window below is over |partitions| rows, never the data
    val offW = Window.orderBy("__pid")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = within.groupBy("__pid")
      .agg(count(lit(1)).as("__pcnt"),
        sumCol.map(c => sum(c)).getOrElse(lit(0L)).as("__psum"))
      .withColumn("__offcnt", coalesce(sum("__pcnt").over(offW), lit(0L)))
      .withColumn("__offsum", coalesce(sum("__psum").over(offW), lit(0L)))
      .select("__pid", "__offcnt", "__offsum")
    val out = within.join(broadcast(offsets), "__pid")
      .withColumn("grank", col("__rn_in") + col("__offcnt"))
    val withCum =
      if (sumCol.isDefined) out.withColumn("gcum", col("__cum_in") + col("__offsum"))
      else out
    withCum.drop("__pid", "__rn_in", "__cum_in", "__offcnt", "__offsum")
  }

  /** SQL `ntile(tiles) OVER (ORDER BY sortCols)` at fact scale: global
    * rank via [[withGlobalRank]], then the exact NTILE fill rule — with
    * n rows the first (n mod tiles) tiles get ⌈n/tiles⌉ rows, the rest
    * ⌊n/tiles⌋ — applied arithmetically from (grank, n). Appends
    * `tile`; `n` arrives by broadcasting the one-row global count. */
  def withNtile(df: DataFrame, sortCols: Seq[Column], tiles: Int): DataFrame = {
    require(tiles > 0, "ntile needs a positive tile count")
    val ranked = withGlobalRank(df, sortCols)
    val total = ranked.groupBy().agg(count(lit(1)).as("__n"))
    ranked.crossJoin(broadcast(total)) // one-row global count
      .withColumn("tile", {
        // Column `/` is DOUBLE division in Spark — every quotient here
        // must floor explicitly or tile boundaries drift off by one
        val n = col("__n"); val k = lit(tiles.toLong)
        val q = floor(n / k).cast("long")
        val r = n % k
        val bigRows = r * (q + lit(1L)) // rows covered by the wide tiles
        when(col("grank") <= bigRows,
          floor((col("grank") - 1) / (q + lit(1L))) + lit(1L))
          .otherwise(
            r + floor((col("grank") - lit(1L) - bigRows) / q) + lit(1L))
          .cast("int")
      })
      .drop("__n")
  }
}
