package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Kll

/** Rolling-window PERCENTILES from stored mergeable sketches — the
  * quantile twin of [[SketchWau]] (same posture, different aggregate):
  * exact windowed percentiles cannot decompose (a window's p90 is not a
  * function of daily p90s — the whole value multiset matters), so the
  * exact spelling either re-scans events per anchor (O(events ×
  * windows)) or buffers whole windows. A per-day [[graft.functions.KllState]]
  * sketch is mergeable: build each day's sketch once, store the binary
  * column, and every rolling window is a union of |window| stored
  * sketches with rank error O(1/k) — the q88/q122/q129/q132 "approx
  * swap at 100 TB" as a materialized operator instead of prose.
  * G6 posture: estimates stay out of any hash gate; the gates are the
  * measured rank-error bound vs exact per-anchor percentiles, the
  * parquet round-trip, and merge≡rebuild (KllSpec). */
object SketchQuantiles {

  /** One KLL sketch of `valueCol` per calendar day — the stored
    * aggregate. One map-side-combined pass, |days| rows out. */
  def dailySketches(events: DataFrame, valueCol: String = "value",
                    k: Int = graft.functions.KllState.DefaultK): DataFrame =
    events
      .select(col("ts").cast("date").as("d"),
        col(valueCol).cast("double").as("v"))
      .groupBy("d")
      .agg(Kll.sketch(col("v"), k).as("sketch"))

  /** Rolling `window`-day percentile estimates from the STORED daily
    * sketches: the SketchWau fan-out (each day posts to its covering
    * anchors), one sketch-union per anchor, quantiles extracted from
    * the merged sketch. O(days·window) sketch merges; events never
    * re-read. `k` must match the k the daily sketches were built with
    * (ADVICE r13: a default-k union silently compacted larger-k daily
    * sketches to k=200 capacity; [[graft.functions.KllMergeAgg]] now
    * also adopts the stored k and rejects mixed-k unions loudly). */
  def rollingQuantiles(daily: DataFrame, window: Int = 7,
                       qs: Seq[Double] = Seq(0.5, 0.9),
                       k: Int = graft.functions.KllState.DefaultK): DataFrame = {
    val bounds = daily.groupBy().agg(min("d").as("mn"), max("d").as("mx"))
    val merged = daily
      .select(col("d"), explode(sequence(lit(0), lit(window - 1))).as("i"),
        col("sketch"))
      .select(date_add(col("d"), col("i")).as("day"), col("sketch"))
      .crossJoin(broadcast(bounds)) // one-row calendar bounds
      .filter(col("day").between(col("mn"), col("mx")))
      .groupBy("day")
      .agg(Kll.merge(col("sketch"), k).as("sk"))
    qs.foldLeft(merged) { case (df, q) =>
        df.withColumn(s"p${math.round(q * 100)}", Kll.quantile(col("sk"), q))
      }
      .drop("sk")
      .orderBy("day")
  }
}
