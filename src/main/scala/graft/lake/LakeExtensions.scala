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
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(LakeExtensions.cosineSim)
    // SELECTs on lake.db.t run on LakeTable.read()'s native plan
    // (vectorized + codegen) instead of the V1Scan row bridge
    ext.injectOptimizerRule(NativeReadRule)
  }
}

object LakeExtensions {
  val WarehouseConf = "spark.graft.warehouse"

  /** Optional session principal for the DSv2 path: when set, the table
    * grants model (M10, lake_formation_setup.py:93-145) gates native
    * `lake.db.t` reads and writes exactly as it gates dispatcher
    * statements; unset, the registered catalog stays the administrative
    * surface it was through round 5. */
  val PrincipalConf = "spark.graft.principal"

  /** The codegen'd fused-loop cosine expression — the same node the
    * DataFrame API (VectorOps.cosine) plans. */
  private[lake] val cosineSim: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[LakeExtensions].getName, "cosine_sim"),
    (args: Seq[Expression]) => {
      require(args.length == 2, "cosine_sim(a, b) takes two array arguments")
      graft.functions.CosineSimilarity.coerced(args(0), args(1))
    })
}

