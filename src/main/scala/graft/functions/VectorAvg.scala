package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.{Encoder, Encoders}

/** Element-wise running sum + count for a fixed-dimension float vector. */
case class VecBuf(sums: Array[Double], count: Long)

/** Typed UDAF (SURVEY.md §2.11 X2): per-group centroid (element-wise mean)
  * of an `ARRAY<FLOAT>` embedding column, accumulated in DOUBLE.
  *
  * Partial aggregation happens map-side (Aggregator contract), so the
  * shuffle carries one (dims + 1)-wide buffer per group per partition —
  * scale-safe at 100 TB: shuffle volume is O(groups x dims), not O(rows).
  */
object VectorAvg extends Aggregator[Seq[Float], VecBuf, Seq[Double]] {
  override def zero: VecBuf = VecBuf(Array.emptyDoubleArray, 0L)

  override def reduce(b: VecBuf, a: Seq[Float]): VecBuf = {
    if (a == null) return b
    if (b.count == 0L) {
      val s = new Array[Double](a.length)
      var i = 0
      while (i < a.length) { s(i) = a(i).toDouble; i += 1 }
      VecBuf(s, 1L)
    } else {
      // ragged input must fail loudly: indexing by the first-seen length
      // would crash obscurely on shorter rows and silently truncate
      // longer ones (wrong centroid)
      require(a.length == b.sums.length,
        s"vector_avg: dimension mismatch (${a.length} vs ${b.sums.length})")
      var i = 0
      while (i < b.sums.length) { b.sums(i) += a(i).toDouble; i += 1 }
      VecBuf(b.sums, b.count + 1L)
    }
  }

  override def merge(x: VecBuf, y: VecBuf): VecBuf = {
    if (x.count == 0L) y
    else if (y.count == 0L) x
    else {
      require(x.sums.length == y.sums.length,
        s"vector_avg: dimension mismatch across partitions " +
          s"(${x.sums.length} vs ${y.sums.length})")
      var i = 0
      while (i < x.sums.length) { x.sums(i) += y.sums(i); i += 1 }
      VecBuf(x.sums, x.count + y.count)
    }
  }

  override def finish(b: VecBuf): Seq[Double] =
    if (b.count == 0L) Seq.empty else b.sums.map(_ / b.count).toSeq

  override def bufferEncoder: Encoder[VecBuf] = Encoders.product[VecBuf]
  override def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder[Seq[Double]]()

  /** Column-facing handle: `vec_avg($"embedding")`. */
  lazy val fn: UserDefinedFunction = udaf(VectorAvg, ExpressionEncoder[Seq[Float]]())
}
