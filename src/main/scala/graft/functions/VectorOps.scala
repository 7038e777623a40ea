package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ARRAY<FLOAT>` / `ARRAY<DOUBLE>` columns, built from
  * codegen'd higher-order functions (no UDFs in the hot path).
  *
  * Cosine similarity is the engine's X1 primitive (SURVEY.md §2.11) used by
  * the similarity-search and near-dup operators. Computation is forced to
  * DOUBLE before accumulating so results are bit-compatible with engines
  * that compute over double lists (e.g. the DuckDB oracle).
  */
object VectorOps {
  /** Cast an ARRAY<FLOAT> column to ARRAY<DOUBLE> element-wise. */
  def toDoubleVec(c: Column): Column = transform(c, _.cast("double"))

  /** Sequential-order dot product: sum_i a[i]*b[i], accumulated in DOUBLE. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two double vectors. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))
}
