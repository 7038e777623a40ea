package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{lit, udaf, udf}
import org.apache.spark.sql.{Column, Encoder, Encoders}

/** Column surface for [[CmsState]], mirroring [[Kll]]: `Cms.sketch`
  * builds a sketch from LONG keys in one map-side-combined pass (a CMS
  * partial IS a CMS — merge is element-wise add), `Cms.merge` unions
  * stored BINARY sketches, `Cms.estimate` point-queries one. */
class CmsAgg(depth: Int, width: Int)
    extends Aggregator[Long, CmsState, Array[Byte]] {
  override def zero: CmsState = new CmsState(depth, width)
  override def reduce(b: CmsState, key: Long): CmsState = {
    b.update(key); b
  }
  override def merge(x: CmsState, y: CmsState): CmsState = {
    x.mergeWith(y); x
  }
  override def finish(b: CmsState): Array[Byte] = b.serialize()
  override def bufferEncoder: Encoder[CmsState] = Encoders.kryo[CmsState]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

/** Weighted build: folds (key, count) PAIRS — the shape that lets a
  * daily sketch build from an already-aggregated counts table instead
  * of re-scanning raw events (one fact pass total, see
  * [[graft.operators.SketchHeavyHitters.dailyState]]). */
class CmsWeightedAgg(depth: Int, width: Int)
    extends Aggregator[(Long, Long), CmsState, Array[Byte]] {
  override def zero: CmsState = new CmsState(depth, width)
  override def reduce(b: CmsState, kv: (Long, Long)): CmsState = {
    b.update(kv._1, kv._2); b
  }
  override def merge(x: CmsState, y: CmsState): CmsState = {
    x.mergeWith(y); x
  }
  override def finish(b: CmsState): Array[Byte] = b.serialize()
  override def bufferEncoder: Encoder[CmsState] = Encoders.kryo[CmsState]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

class CmsMergeAgg(depth: Int, width: Int)
    extends Aggregator[Array[Byte], CmsState, Array[Byte]] {
  override def zero: CmsState = new CmsState(depth, width)
  override def reduce(b: CmsState, bytes: Array[Byte]): CmsState = {
    if (bytes != null && bytes.nonEmpty)
      b.mergeWith(CmsState.deserialize(bytes))
    b
  }
  override def merge(x: CmsState, y: CmsState): CmsState = {
    x.mergeWith(y); x
  }
  override def finish(b: CmsState): Array[Byte] = b.serialize()
  override def bufferEncoder: Encoder[CmsState] = Encoders.kryo[CmsState]
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}

object Cms {
  /** `cms_sketch_agg(longKey)` → BINARY sketch. Hash wider values to a
    * 64-bit key first (`xxhash64(col)` — the q29 key discipline). */
  def sketch(c: Column, depth: Int = CmsState.DefaultDepth,
             width: Int = CmsState.DefaultWidth): Column =
    udaf(new CmsAgg(depth, width), Encoders.scalaLong).apply(c)

  /** `cms_sketch_agg_weighted(key, count)` → BINARY sketch; equivalent
    * to `count` unweighted updates of `key`. */
  def sketchWeighted(key: Column, cnt: Column,
                     depth: Int = CmsState.DefaultDepth,
                     width: Int = CmsState.DefaultWidth): Column =
    udaf(new CmsWeightedAgg(depth, width),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .apply(key, cnt)

  /** `cms_union_agg(sketches)` → BINARY merged sketch. */
  def merge(c: Column, depth: Int = CmsState.DefaultDepth,
            width: Int = CmsState.DefaultWidth): Column =
    udaf(new CmsMergeAgg(depth, width), Encoders.BINARY).apply(c)

  private val estimateUdf =
    udf((b: Array[Byte], key: Long) =>
      if (b == null || b.isEmpty) 0L
      else CmsState.deserialize(b).estimate(key))

  /** `cms_estimate(sketch, key)` → overestimate-only count. Runs per
    * (group, candidate) on finished sketches — plain-udf altitude. */
  def estimate(sketch: Column, key: Column): Column =
    estimateUdf(sketch, key)

  /** Total updates folded into the sketch. */
  private val totalUdf =
    udf((b: Array[Byte]) =>
      if (b == null || b.isEmpty) 0L else CmsState.deserialize(b).n)
  def total(sketch: Column): Column = totalUdf(sketch)
}
