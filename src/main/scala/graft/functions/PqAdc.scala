package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd PQ encode-and-score (asymmetric distance computation) for
  * q72's product-quantization ANN (VERDICT r8 next #7): for each corpus
  * vector, find the nearest sub-codebook centroid per subspace (the PQ
  * encode) and sum the query's precomputed distance to that centroid
  * (the ADC score) — one fused loop INSIDE whole-stage codegen, where
  * the previous typed `Dataset.map` spelling broke the codegen span with
  * a DeserializeToObject / SerializeFromObject fence around the scan.
  *
  * The codebook (`cb`, row-major `[code][subspace*dsub+i]`, `codes`×`m·dsub`
  * doubles) and the query's per-(subspace, centroid) distance table
  * (`dtab`, row-major `[subspace][code]`) are kilobyte-scale driver
  * constants shipped as codegen reference objects — at 100 TB the scan
  * side holds only the vectors (or, with materialized codes, 8-byte
  * codes) and this expression is the whole per-row cost: m·codes·dsub
  * multiply-adds, no shuffle, no object serialization boundary.
  *
  * Distances compare under `sqrt` with strict `<` (ties keep the lowest
  * centroid id) and the ADC adds subspace terms in fixed ascending-s
  * order — bit-for-bit the ordering DuckDB's `list_distance` +
  * `(distance, cid)` window produces, which is what keeps q72 hash-green.
  */
case class PqAdcScore(
    child: Expression,
    cb: Array[Double],
    dtab: Array[Double],
    m: Int,
    dsub: Int,
    codes: Int)
  extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_score"
  override def nullable: Boolean = child.nullable

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    var dist = 0.0
    var sp = 0
    while (sp < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < codes) {
        var acc = 0.0
        var i = 0
        while (i < dsub) {
          val d = v.getDouble(sp * dsub + i) - cb(c * (m * dsub) + sp * dsub + i)
          acc += d * d
          i += 1
        }
        val dd = math.sqrt(acc)
        if (dd < bestD) { bestD = dd; best = c }
        c += 1
      }
      val ld = dtab(sp * codes + best)
      dist += ld * ld
      sp += 1
    }
    dist
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val cbRef = ctx.addReferenceObj("pqCb", cb, "double[]")
      val dtabRef = ctx.addReferenceObj("pqDtab", dtab, "double[]")
      val dist = ctx.freshName("dist")
      val sp = ctx.freshName("sp")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val c = ctx.freshName("c")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val dd = ctx.freshName("dd")
      val ld = ctx.freshName("ld")
      s"""
         |double $dist = 0.0;
         |for (int $sp = 0; $sp < $m; $sp++) {
         |  int $best = 0; double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $codes; $c++) {
         |    double $acc = 0.0;
         |    for (int $i = 0; $i < $dsub; $i++) {
         |      double $d = $v.getDouble($sp * $dsub + $i)
         |        - $cbRef[$c * ${m * dsub} + $sp * $dsub + $i];
         |      $acc += $d * $d;
         |    }
         |    double $dd = java.lang.Math.sqrt($acc);
         |    if ($dd < $bestD) { $bestD = $dd; $best = $c; }
         |  }
         |  double $ld = $dtabRef[$sp * $codes + $best];
         |  $dist += $ld * $ld;
         |}
         |${ev.value} = $dist;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PqAdcScore =
    copy(child = newChild)
}

object PqAdcScore {
  /** Column wrapper with construction-time coercion to ARRAY<DOUBLE>
    * (same rationale as [[CosineSimilarity.coerced]]). The codebook is
    * passed row-major per centroid over the FULL dimension (`codes` rows
    * of `m * dsub` doubles) so a centroid's subspace slice is contiguous.
    */
  def score(vec: Column, cb: Array[Array[Double]], dtab: Array[Array[Double]],
      m: Int, dsub: Int, codes: Int): Column = {
    val flatCb = cb.flatten
    val flatDt = dtab.flatten
    require(flatCb.length == codes * m * dsub, s"codebook shape: ${flatCb.length}")
    require(flatDt.length == m * codes, s"dtab shape: ${flatDt.length}")
    ColumnBridge.column(PqAdcScore(
      Cast(ColumnBridge.expression(vec), ArrayType(DoubleType)),
      flatCb, flatDt, m, dsub, codes))
  }
}
