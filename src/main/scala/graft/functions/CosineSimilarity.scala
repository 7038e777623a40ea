package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Cast, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native codegen'd cosine similarity (X1's performance end-state,
  * SURVEY.md §7.3): one fused loop computes dot(a,b), ‖a‖² and ‖b‖²
  * simultaneously inside whole-stage codegen — versus three interpreted
  * higher-order aggregate passes for the zip_with/aggregate composition.
  * Float inputs are implicitly cast to ARRAY<DOUBLE>, and the sequential
  * accumulation order matches both the HOF form and DuckDB's
  * `list_cosine_similarity`, so oracle parity is bit-exact.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"
  // mismatched lengths / null elements yield NULL (below), even when
  // the child arrays themselves are non-nullable
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    // DuckDB's list_cosine_similarity errors on ragged pairs and NULL
    // elements; NULL is the total-function analogue — silently zeroing
    // a null slot or truncating to the shorter prefix would produce a
    // finite-but-wrong similarity that diverges from the oracle
    if (n != ys.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val x = xs.getDouble(i); val y = ys.getDouble(i)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) { ${ev.isNull} = true; }
         |else {
         |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    double $x = $a.getDouble($i);
         |    double $y = $b.getDouble($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** Construction-time coercion to ARRAY<DOUBLE> (`ImplicitCastInputTypes`
    * would do this, but its `AbstractDataType` vocabulary is private[sql];
    * a double→double cast is folded away by SimplifyCasts). */
  def coerced(a: Expression, b: Expression): CosineSimilarity =
    CosineSimilarity(
      Cast(a, ArrayType(DoubleType)), Cast(b, ArrayType(DoubleType)))
}
