package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{lit, udaf, udf}
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Column-facing surface for [[KllState]]: `Kll.sketch` builds a sketch
  * column from raw doubles (one map-side-combined pass — Aggregator
  * partials are sketches and merge as sketches), `Kll.merge` unions
  * STORED sketch columns (the O(days) rolling-window step), and
  * `Kll.quantile` extracts an estimate from sketch bytes. Buffers ride
  * kryo (an opaque binary agg buffer — the state is mutable compactor
  * arrays, not a product), outputs are plain BINARY, so the sketch
  * column is parquet-storable and survives an MV round-trip
  * ([[graft.operators.SketchQuantiles]] + KllSpec gate it). */
class KllAgg(k: Int) extends Aggregator[Double, KllState, Array[Byte]] {
  override def zero: KllState = new KllState(k)
  override def reduce(b: KllState, v: Double): KllState = { b.update(v); b }
  override def merge(x: KllState, y: KllState): KllState = {
    x.mergeWith(y); x
  }
  override def finish(b: KllState): Array[Byte] = b.serialize()
  override def bufferEncoder: Encoder[KllState] = Encoders.kryo[KllState]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Union aggregate over serialized sketches. `k` is only the EMPTY
  * accumulator's placeholder: the aggregate ADOPTS the k embedded in the
  * first non-empty input's bytes (the stored sketches are the source of
  * truth for their own accuracy budget — ADVICE r13: merging k=400 daily
  * sketches through a k=200 accumulator silently tapered capacity below
  * what the caller built), and a LATER input with a DIFFERENT k fails
  * loudly rather than degrading silently. */
class KllMergeAgg(k: Int) extends Aggregator[Array[Byte], KllState, Array[Byte]] {
  override def zero: KllState = new KllState(k)
  private def adopt(acc: KllState, in: KllState): KllState =
    if (acc.n == 0 && in.k != acc.k) in // empty accumulator: take in's k
    else {
      require(in.k == acc.k || in.n == 0,
        s"kll_union_agg: mixed sketch k (${acc.k} vs ${in.k}) — unions " +
          "must share the k the sketches were built with")
      acc.mergeWith(in); acc
    }
  override def reduce(b: KllState, bytes: Array[Byte]): KllState =
    if (bytes == null || bytes.isEmpty) b
    else adopt(b, KllState.deserialize(bytes))
  override def merge(x: KllState, y: KllState): KllState = adopt(x, y)
  override def finish(b: KllState): Array[Byte] = b.serialize()
  override def bufferEncoder: Encoder[KllState] = Encoders.kryo[KllState]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object Kll {
  /** `kll_sketch_agg(values)` → BINARY sketch. */
  def sketch(c: Column, k: Int = KllState.DefaultK): Column =
    udaf(new KllAgg(k), Encoders.scalaDouble).apply(c)

  /** `kll_union_agg(sketches)` → BINARY merged sketch. */
  def merge(c: Column, k: Int = KllState.DefaultK): Column =
    udaf(new KllMergeAgg(k), Encoders.BINARY).apply(c)

  private val quantileUdf =
    udf((b: Array[Byte], q: Double) =>
      if (b == null || b.isEmpty) Double.NaN
      else KllState.deserialize(b).quantile(q))

  /** `kll_quantile(sketch, q)` → estimated value at quantile q. Not a
    * hot-path expression: it runs once per GROUP on finished sketches,
    * so a plain udf is the right altitude (no codegen needed). */
  def quantile(c: Column, q: Double): Column = quantileUdf(c, lit(q))
}
