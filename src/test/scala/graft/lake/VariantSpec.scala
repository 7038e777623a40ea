package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Iceberg v3 VARIANT columns (M47): semi-structured values stored in
  * Spark's native variant encoding, flowing through the full lake
  * surface — append, MoR delete, CoW update, compaction, time travel —
  * with the v3 format gate Iceberg's spec requires (variant landed in
  * spec v3; a v2 table carrying one is unreadable to v2 readers).
  * Shredded variant storage (parquet typed subcolumns) is out of scope;
  * values round-trip through Spark's binary variant encoding. */
class VariantSpec extends SparkSpec {

  private val vSchema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("payload", VariantType)))

  private def freshCatalog(): LakeCatalog = {
    val wh = Files.createTempDirectory("graft-variant-wh")
    var t = 1700000000000L
    new LakeCatalog(spark, wh, () => { t += 1000; t })
  }

  private def docs(rows: (Int, String)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, j) => Row(i, j) }, 1),
      StructType(Seq(StructField("id", IntegerType), StructField("js", StringType))))
      .select(col("id"), parse_json(col("js")).as("payload"))

  test("variant is v3-gated: v2 create/add-column reject with the upgrade hint") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val e = intercept[IllegalArgumentException](
      cat.createTable("db", "v2v", vSchema))
    assert(e.getMessage.contains("format-version 3"), e.getMessage)
    // nested variant is caught too
    val nested = StructType(Seq(StructField("id", IntegerType),
      StructField("arr", ArrayType(VariantType))))
    assertThrows[IllegalArgumentException](cat.createTable("db", "v2n", nested))
    // ADD COLUMN on a live v2 table: same gate; after upgrade it works
    var t = cat.createTable("db", "up", StructType(Seq(StructField("id", IntegerType))))
    assertThrows[IllegalArgumentException](t.addColumn("payload", VariantType))
    t = Procedures.upgradeFormatVersion(t, 3)
    t = t.addColumn("payload", VariantType)
    assert(t.schema("payload").dataType == VariantType)
  }

  test("variant flows through append, MoR delete, CoW update, compaction " +
    "and time travel") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "vt", vSchema,
      props = Map("format-version" -> "3",
        "write.delete.mode" -> "merge-on-read"))
    t = t.append(docs(
      1 -> """{"kind": "text", "tokens": 120}""",
      2 -> """{"kind": "image", "w": 640, "h": 480}""",
      3 -> """{"kind": "text", "tokens": 64}"""))
    def kinds(df: DataFrame): Map[Int, String] = df
      .select(col("id"),
        variant_get(col("payload"), "$.kind", "string").as("k"))
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(kinds(t.read()) == Map(1 -> "text", 2 -> "image", 3 -> "text"))
    // typed extraction works post-scan (the whole point of variant)
    val toks = t.read().select(col("id"),
        variant_get(col("payload"), "$.tokens", "int").as("tk"))
      .collect().map(r => r.getInt(0) -> Option(r.getAs[Any]("tk"))).toMap
    assert(toks == Map(1 -> Some(120), 2 -> None, 3 -> Some(64)))
    // MoR delete by a non-variant predicate: survivors keep their bytes
    t = t.delete(col("id") === 2)
    assert(kinds(t.read()) == Map(1 -> "text", 3 -> "text"))
    // CoW-style update of the NON-variant column rewrites rows carrying
    // variant payloads through writeDataFiles intact
    t = t.update(Map("id" -> lit(30)), col("id") === 3)
    assert(kinds(t.read()) == Map(1 -> "text", 30 -> "text"))
    assert(t.read().filter(col("id") === 30)
      .select(variant_get(col("payload"), "$.tokens", "int"))
      .head().getInt(0) == 64)
    // compaction round-trips the variant encoding
    val compacted = Procedures.rewriteDataFiles(t).table
    assert(kinds(compacted.read()) == Map(1 -> "text", 30 -> "text"))
    // time travel reads the pre-delete snapshot with payloads intact
    val firstSnap = compacted.meta.snapshots.map(_.id).min
    assert(kinds(compacted.readSnapshot(firstSnap)) ==
      Map(1 -> "text", 2 -> "image", 3 -> "text"))
  }
}
