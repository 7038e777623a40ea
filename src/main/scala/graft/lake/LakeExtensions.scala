package graft.lake

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Spark-native session integration (SparkSessionExtensions): registers
  * the `cosine_sim(a, b)` SQL function (X1) from the same composition
  * the DataFrame API uses. Table resolution for `lake.db.t` /
  * `glue_catalog.db.t` goes through the DSv2 catalog
  * ([[LakeSparkCatalog]]), the mechanism Spark actually consults for
  * multi-part names.
  *
  * Activate with `.config("spark.sql.extensions", "graft.lake.LakeExtensions")`
  * and point `spark.graft.warehouse` at the warehouse root.
  */
class LakeExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    ext.injectFunction(LakeExtensions.cosineSim)
}

object LakeExtensions {
  val WarehouseConf = "spark.graft.warehouse"

  /** The same composition VectorOps.cosine builds through the Column API,
    * assembled from catalyst nodes: dot(a,b) / (√dot(a,a) · √dot(b,b))
    * with dot = aggregate(zip_with(a, b, ·*·), 0.0, ·+·). */
  private[lake] val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[LakeExtensions].getName, "cosine_sim"),
    (args: Seq[Expression]) => {
      import org.apache.spark.sql.catalyst.expressions._
      require(args.length == 2, "cosine_sim(a, b) takes two array arguments")
      def lv(n: String) = UnresolvedNamedLambdaVariable(Seq(n))
      def dbl(e: Expression) =
        ArrayTransform(e, LambdaFunction(
          Cast(lv("e"), org.apache.spark.sql.types.DoubleType), Seq(lv("e"))))
      def dot(a: Expression, b: Expression) =
        ArrayAggregate(
          ZipWith(dbl(a), dbl(b),
            LambdaFunction(Multiply(lv("x"), lv("y")), Seq(lv("x"), lv("y")))),
          Literal(0.0),
          LambdaFunction(Add(lv("acc"), lv("v")), Seq(lv("acc"), lv("v"))),
          LambdaFunction(lv("r"), Seq(lv("r"))))
      Divide(dot(args(0), args(1)),
        Multiply(Sqrt(dot(args(0), args(0))), Sqrt(dot(args(1), args(1)))))
    })
}

