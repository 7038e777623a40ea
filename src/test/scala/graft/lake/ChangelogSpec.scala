package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Row-level CDC changelog (Iceberg's `create_changelog_view` surface):
  * every commit in a range rendered as INSERT/DELETE diffs, carryover
  * rows of copy-on-write rewrites netted out, MoR delete files resolved
  * to the rows they newly hide. */
class ChangelogSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("category", StringType),
    StructField("amount", DoubleType)))

  private def freshCatalog(): LakeCatalog = {
    val wh = Files.createTempDirectory("graft-cdc-wh")
    var t = 1700000000000L
    new LakeCatalog(spark, wh, () => { t += 1000; t })
  }

  private def df(rows: (Int, String, Double)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, c, a) => Row(i, c, a) }, 1),
      schema)

  private val sixRows = Seq(
    (1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0),
    (4, "b", 40.0), (5, "c", 50.0), (6, "c", 60.0))

  private def morProps = Map(
    "write.delete.mode" -> "merge-on-read",
    "write.update.mode" -> "merge-on-read")

  /** (change_type, id) pairs sorted for assertion. */
  private def changes(cdf: DataFrame): Seq[(String, Int)] =
    cdf.select(LakeTable.ChangeTypeCol, "id").collect()
      .map(r => (r.getString(0), r.getInt(1))).sortBy(p => (p._1, p._2)).toSeq

  test("appends emit INSERTs with ordinals and snapshot ids; empty range legal") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "a", schema, props = morProps)
      .append(df(sixRows.take(2): _*))          // snapshot 1
      .append(df((3, "b", 30.0)))               // snapshot 2
    val full = t.readChangelog(None, 2L)
    assert(changes(full) ==
      Seq(("INSERT", 1), ("INSERT", 2), ("INSERT", 3)))
    // ordinal counts commits from the range start; snapshot id is carried
    val byOrd = full.select(col(LakeTable.ChangeOrdinalCol),
        col(LakeTable.ChangeSnapshotCol), col("id"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2))).sorted.toSeq
    assert(byOrd == Seq((0, 1L, 1), (0, 1L, 2), (1, 2L, 3)))
    assert(changes(t.readChangelog(Some(1L), 2L)) == Seq(("INSERT", 3)))
    assert(t.readChangelog(Some(2L), 2L).count() == 0) // legal empty poll
  }

  test("MoR delete emits DELETE for exactly the newly hidden rows") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "m", schema, props = morProps)
      .append(df(sixRows: _*))                  // snapshot 1
      .delete(col("id").isin(2, 4))             // snapshot 2 (position deletes)
      .delete(col("id") === 2 || col("id") === 5) // snapshot 3: 2 already dead
    assert(changes(t.readChangelog(Some(1L), 2L)) ==
      Seq(("DELETE", 2), ("DELETE", 4)))
    // id=2 died at snapshot 2 and must NOT be re-reported at snapshot 3
    assert(changes(t.readChangelog(Some(2L), 3L)) == Seq(("DELETE", 5)))
    assert(changes(t.readChangelog(Some(1L), 3L)) ==
      Seq(("DELETE", 2), ("DELETE", 4), ("DELETE", 5)))
  }

  test("MoR update appears as its DELETE+INSERT pair") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "u", schema, props = morProps)
      .append(df(sixRows: _*))                  // snapshot 1
      .update(Map("amount" -> lit(99.0)), col("id") === 3) // snapshot 2
    val cdf = t.readChangelog(Some(1L), 2L)
    assert(changes(cdf) == Seq(("DELETE", 3), ("INSERT", 3)))
    val amounts = cdf.select(col(LakeTable.ChangeTypeCol), col("amount")).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(amounts == Map("DELETE" -> 30.0, "INSERT" -> 99.0))
  }

  test("compaction emits nothing; CoW delete nets carryovers to the real diff") {
    val cat = freshCatalog(); cat.createNamespace("db")
    // default write modes = copy-on-write
    val t1 = cat.createTable("db", "c", schema).append(df(sixRows: _*))
    val t2 = Procedures.rewriteDataFiles(
      t1, Map("rewrite-all" -> "true")).table   // snapshot 2: replace
    assert(t2.readChangelog(Some(1L), 2L).count() == 0,
      "compaction is not a logical row change")
    // CoW delete rewrites the whole file; only the dead row may surface
    val t3 = t2.delete(col("id") === 4)         // snapshot 3
    assert(changes(t3.readChangelog(Some(2L), 3L)) == Seq(("DELETE", 4)))
    // with netting off, the rewrite's copied rows appear as DELETE+INSERT
    val raw = t3.readChangelog(Some(2L), 3L, removeCarryovers = false)
    assert(changes(raw).count(_._1 == "INSERT") == 5)
    assert(changes(raw).count(_._1 == "DELETE") == 6)
  }

  test("duplicate rows net by count, not by distinct value") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "d", schema)
      .append(df((1, "a", 10.0), (1, "a", 10.0), (2, "b", 20.0)))
      .delete(col("id") === 2)                  // CoW rewrite of the file
    // both copies of (1,a,10.0) are carried over and net to zero; the
    // dead row surfaces exactly once
    assert(changes(t.readChangelog(Some(1L), 2L)) == Seq(("DELETE", 2)))
  }

  test("retention-truncated head emits baseline INSERTs even with live deletes") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t1 = cat.createTable("db", "r", schema, props = morProps)
      .append(df(sixRows: _*))                  // snapshot 1
      .delete(col("id") === 1)                  // snapshot 2 + delete files
      .append(df((7, "d", 70.0)))               // snapshot 3
    val t2 = Procedures.expireSnapshots(
      t1, olderThanMs = Long.MaxValue, retainLast = 2).table
    assert(t2.meta.snapshots.map(_.id) == Seq(2L, 3L))
    // snapshot 2 is the truncation head: its LIVE state (deletes applied)
    // is the baseline — where readIncremental must refuse, the changelog
    // emits rows, so head delete files are no obstacle
    val cdf = t2.readChangelog(None, 3L)
    assert(changes(cdf) == Seq(("INSERT", 2), ("INSERT", 3), ("INSERT", 4),
      ("INSERT", 5), ("INSERT", 6), ("INSERT", 7)))
    val ords = cdf.select(col(LakeTable.ChangeOrdinalCol), col("id")).collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(ords == Seq((0, 2), (0, 3), (0, 4), (0, 5), (0, 6), (1, 7)))
    // an explicit start below retention still fails loudly
    val e = intercept[IllegalArgumentException](t2.readChangelog(Some(1L), 3L))
    assert(e.getMessage.contains("expire_snapshots retention"))
  }

  test("create_changelog_view: dispatcher CALL registers the diff view") {
    val wh = Files.createTempDirectory("graft-cdcv-wh")
    val sql = new LakeSql(new LakeCatalog(spark, wh))
    sql.run("""CREATE TABLE db.cv (id INT, category STRING) TBLPROPERTIES (
      'write.delete.mode'='merge-on-read', 'write.update.mode'='merge-on-read')""")
    sql.run("INSERT INTO db.cv VALUES (1, 'a'), (2, 'b')")
    sql.run("DELETE FROM db.cv WHERE id = 1")
    val named = sql.run("CALL lake.system.create_changelog_view(" +
      "table => 'db.cv')").head().getString(0)
    assert(named == "cv_changes")
    val rows = spark.sql(
      s"SELECT _change_type, id FROM cv_changes ORDER BY _change_ordinal, id")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    assert(rows == Seq(("INSERT", 1), ("INSERT", 2), ("DELETE", 1)))
    // bounded range + explicit view name
    sql.run("CALL lake.system.create_changelog_view(table => 'db.cv', " +
      "start_snapshot_id => 1, end_snapshot_id => 2, " +
      "changelog_view => 'cv_tail')")
    assert(spark.sql("SELECT _change_type, id FROM cv_tail").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq == Seq(("DELETE", 1)))
    spark.catalog.dropTempView("cv_changes")
    spark.catalog.dropTempView("cv_tail")
  }

  test("create_changelog_view: native CALL via the DSv2 catalog") {
    val wh = Files.createTempDirectory("graft-cdcn-wh")
    val sql = new LakeSql(new LakeCatalog(spark, wh))
    sql.run("""CREATE TABLE db.nv (id INT) TBLPROPERTIES (
      'write.delete.mode'='merge-on-read', 'write.update.mode'='merge-on-read')""")
    sql.run("INSERT INTO db.nv VALUES (1), (2), (3)")
    sql.run("DELETE FROM db.nv WHERE id = 2")
    spark.conf.set(LakeExtensions.WarehouseConf, wh.toString)
    val out = spark.sql("CALL lake.system.create_changelog_view(" +
      "table => 'db.nv', changelog_view => 'nv_cdc')").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("nv_cdc"))
    assert(spark.sql("SELECT _change_type, id FROM nv_cdc ORDER BY _change_ordinal, id")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("INSERT", 1), ("INSERT", 2), ("INSERT", 3), ("DELETE", 2)))
    spark.catalog.dropTempView("nv_cdc")
  }
}
