package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Differential property for [[NativeReadRule]]: for random predicates,
  * `spark.sql` over `lake.db.t` (the spliced native plan, with its
  * predicate-driven partition/stats pruning) must return exactly what
  * `LakeTable.read()` + the same filter returns. The table carries the
  * full MoR arc — appends, position deletes, an update, an equality
  * delete — so the splice is tested against a scan with real anti-joins,
  * and the generated predicates cover the shapes the pruning translator
  * handles (equality, ranges, IN) plus ones it must pass through
  * untouched (OR, arithmetic, string ops). */
class NativeReadPropertySpec extends SparkSpec {

  test("native SQL reads ≡ API reads under random predicates") {
    val wh = Files.createTempDirectory("graft-nrp-wh")
    val sql = new LakeSql(new LakeCatalog(spark, wh))
    sql.run("""CREATE TABLE db.p (id INT, category STRING, amount DOUBLE)
      PARTITIONED BY (category) TBLPROPERTIES (
      'write.delete.mode'='merge-on-read', 'write.update.mode'='merge-on-read')""")
    val rnd = new scala.util.Random(20260813L)
    val cats = Array("a", "b", "c")
    (0 until 3).foreach { batch =>
      val values = (0 until 40).map { i =>
        val id = batch * 100 + i
        s"($id, '${cats(rnd.nextInt(3))}', ${rnd.nextInt(500)}.${rnd.nextInt(100)})"
      }
      sql.run(s"INSERT INTO db.p VALUES ${values.mkString(", ")}")
    }
    sql.run("DELETE FROM db.p WHERE id % 7 = 0")
    sql.run("UPDATE db.p SET amount = amount + 1000 WHERE category = 'b' AND id < 150")
    val t0 = sql.catalog.loadTable("db", "p").get
    t0.addEqualityDeletes(
      spark.range(3).select(col("id").cast("int").as("id")), Seq("id"))
    spark.conf.set(LakeExtensions.WarehouseConf, wh.toString)

    val predicates = Seq(
      "category = 'a'",
      "category IN ('a', 'c')",
      "id < 120",
      "id >= 50 AND id <= 210",
      "amount > 250.0",
      "category = 'b' AND amount > 1000",
      "category = 'a' OR id > 200",
      "id % 3 = 1",
      "amount BETWEEN 100 AND 300 AND category <> 'c'",
      "substring(category, 1, 1) = 'a'",
      "id IN (5, 15, 25, 105, 205)",
      "NOT (category = 'c')",
      "id > 1000", // empty result
      "true")
    val api = sql.catalog.loadTable("db", "p").get.read()
    for (p <- predicates) {
      val viaSql = spark.sql(s"SELECT id, category, amount FROM lake.db.p WHERE $p")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).sorted.toSeq
      val viaApi = api.filter(expr(p))
        .select("id", "category", "amount")
        .collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).sorted.toSeq
      assert(viaSql == viaApi,
        s"predicate [$p]: sql=${viaSql.size} rows, api=${viaApi.size} rows; " +
          s"missing=${viaApi.diff(viaSql).take(3)} extra=${viaSql.diff(viaApi).take(3)}")
    }
  }
}
