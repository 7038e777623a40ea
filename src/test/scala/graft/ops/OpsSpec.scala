package graft.ops

import java.nio.file.Files

import graft.SparkSpec
import graft.lake.{AccessDeniedException, LakeCatalog, LakeSql, Meta}

/** S8 dispatcher, S9/§2.12 verifier, M8/M9 upgrade driver, M10 grants
  * enforcement, and the demo.sh E2E arc. */
class OpsSpec extends SparkSpec {

  private def freshSql(): LakeSql = {
    val wh = Files.createTempDirectory("graft-ops-wh")
    new LakeSql(new LakeCatalog(spark, wh))
  }

  test("LakeSql: DDL/DML/SELECT statement sequence drives the engine (S8)") {
    val sql = freshSql()
    sql.run("""CREATE TABLE db.t (id INT, category STRING, amount DECIMAL(10,2))
               PARTITIONED BY (category)
               TBLPROPERTIES ('format-version'='2',
                 'write.delete.mode'='merge-on-read',
                 'write.update.mode'='merge-on-read')""")
    sql.run("INSERT INTO db.t VALUES (1, 'a', 10.50), (2, 'b', 20.00), (3, 'a', 30.25)")
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.t").head().getLong(0) == 3)
    sql.run("DELETE FROM db.t WHERE id = 2")
    sql.run("UPDATE db.t SET amount = amount * 2 WHERE category = 'a'")
    val rows = sql.run("SELECT id, amount FROM db.t ORDER BY id").collect()
      .map(r => r.getInt(0) -> r.getDecimal(1).toPlainString)
    assert(rows.toSeq == Seq(1 -> "21.00", 3 -> "60.50"))
    // DESCRIBE (M6) + ALTER + CALL (M2) round-trip
    assert(sql.run("DESCRIBE db.t").count() == 3)
    sql.run("ALTER TABLE db.t SET TBLPROPERTIES ('format-version'='3')")
    val res = sql.run(
      "CALL lake.system.rewrite_data_files(table => 'db.t', " +
        "options => map('rewrite-all', 'true'))").head()
    assert(res.getInt(0) > 0) // rewritten files
    assert(sql.catalog.loadTable("db", "t").get.deleteFiles.isEmpty)
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.t").head().getLong(0) == 2)
    sql.run("DROP TABLE IF EXISTS db.t")
    assert(!sql.catalog.tableExists("db", "t"))
  }

  test("LakeSql: SHOW TABLES / SHOW PARTITIONS / SHOW CREATE TABLE") {
    val sql = freshSql()
    sql.run("""CREATE TABLE db.s (id BIGINT, name STRING, ts TIMESTAMP)
               PARTITIONED BY (months(ts), bucket(4, id))
               TBLPROPERTIES ('format-version'='3')""")
    sql.run("CREATE TABLE db2.other (x INT)")
    sql.run("""INSERT INTO db.s VALUES
      (1, 'a', TIMESTAMP '2026-01-05 03:00:00'),
      (2, 'b', TIMESTAMP '2026-01-20 13:00:00'),
      (3, 'c', TIMESTAMP '2026-02-01 00:30:00')""")

    val tables = sql.run("SHOW TABLES").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(tables == Seq(("db", "s"), ("db2", "other")))
    assert(sql.run("SHOW TABLES IN db2").collect()
      .map(_.getString(1)).toSeq == Seq("other"))

    // per-partition rollup: 2 Jan months-buckets + 1 Feb (bucket split
    // depends on the hash, so assert via the month prefix + row totals)
    val parts = sql.run("SHOW PARTITIONS db.s").collect()
      .map(r => (r.getString(0), r.getLong(2))).toSeq
    assert(parts.map(_._2).sum == 3)
    assert(parts.forall { case (p, _) =>
      p.contains("ts_month=2026-0") && p.contains("id_bucket_4=") })
    // same rollup through the metadata-table spelling
    assert(sql.run("SELECT * FROM db.s.partitions").count() == parts.size)

    // SHOW CREATE TABLE round-trips through the dispatcher's own grammar
    val ddl = sql.run("SHOW CREATE TABLE db.s").head().getString(0)
    assert(ddl.contains("PARTITIONED BY (months(ts), bucket(4,id))"))
    assert(ddl.contains("'format-version'='3'"))
    val sql2 = freshSql()
    sql2.run(ddl.replace("CREATE TABLE db.s", "CREATE TABLE db.roundtrip"))
    val rt = sql2.catalog.loadTable("db", "roundtrip").get
    assert(rt.transforms.map(_.spec) == Seq("months(ts)", "bucket(4,id)"))
    assert(rt.meta.formatVersion == 3)
  }

  test("LakeSql: SHOW TBLPROPERTIES and UNSET TBLPROPERTIES") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.tp (id INT) TBLPROPERTIES " +
      "('write.sort-order'='id', 'owner.team'='data')")
    val props = sql.run("SHOW TBLPROPERTIES db.tp").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props("write.sort-order") == "id")
    assert(props("owner.team") == "data")
    assert(props("format-version") == "2")
    sql.run("ALTER TABLE db.tp UNSET TBLPROPERTIES ('owner.team', 'no.such.key')")
    val after = sql.run("SHOW TBLPROPERTIES db.tp").collect()
      .map(r => r.getString(0)).toSet
    assert(!after.contains("owner.team"))
    assert(after.contains("write.sort-order")) // untouched keys survive
    assertThrows[graft.lake.SqlParseException](
      sql.run("ALTER TABLE db.tp UNSET TBLPROPERTIES ()"))
  }

  test("SHOW TABLES hides ungranted tables from a session principal (M10)") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.open (x INT)")
    sql.run("CREATE TABLE db.secret (y INT)")
    sql.catalog.grant("db", "open", "alice", Seq("SELECT"))
    // no principal: administrative view, everything listed
    assert(sql.run("SHOW TABLES").count() == 2)
    // principal: only granted tables enumerate
    assert(sql.run("SHOW TABLES", Some("alice")).collect()
      .map(_.getString(1)).toSeq == Seq("open"))
    assert(sql.run("SHOW TABLES", Some("mallory")).count() == 0)
  }

  test("ALTER TABLE … WRITE ORDERED BY sets the sort property, validates " +
    "names, and WRITE UNORDERED clears it") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.wo (id BIGINT, v BIGINT)")
    sql.run("ALTER TABLE db.wo WRITE ORDERED BY v, id")
    assert(sql.catalog.loadTable("db", "wo").get.meta.props
      .get("write.sort-order").contains("v,id"))
    // the DDL is where a typo must surface — the write path skips
    // unknown names rather than failing appends
    intercept[Exception] {
      sql.run("ALTER TABLE db.wo WRITE ORDERED BY nope")
    }
    assert(sql.catalog.loadTable("db", "wo").get.meta.props
      .get("write.sort-order").contains("v,id"), "failed DDL must not apply")
    sql.run("ALTER TABLE db.wo WRITE UNORDERED")
    assert(sql.catalog.loadTable("db", "wo").get.meta.props
      .get("write.sort-order").forall(_.isEmpty))
  }

  test("WRITE ORDERED BY accepts Iceberg's ASC/DESC/NULLS FIRST|LAST " +
    "qualifiers, canonicalizes them, and the write path honors them " +
    "(ADVICE r8: 'ts DESC' used to fail as unknown column 'ts desc')") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.woq (id BIGINT, v BIGINT)")
    sql.run("ALTER TABLE db.woq WRITE ORDERED BY v DESC NULLS LAST, id ASC")
    assert(sql.catalog.loadTable("db", "woq").get.meta.props
      .get("write.sort-order").contains("v desc nulls last,id asc"))

    // a qualified order actually shapes the written file: v descends
    sql.run("ALTER TABLE db.woq WRITE ORDERED BY v DESC")
    val df = sql.catalog.spark.range(0, 200, 1, 1)
      .selectExpr("id", "(id * 37) % 200 AS v")
    sql.catalog.loadTable("db", "woq").get.append(df)
    sql.catalog.loadTable("db", "woq").get.dataFiles.foreach { f =>
      val vs = sql.catalog.spark.read.parquet(f.path)
        .select("v").collect().map(_.getLong(0)).toSeq
      assert(vs == vs.sorted.reverse, s"file ${f.path} not DESC-sorted by v")
    }

    // a typo under qualifiers still surfaces as an unknown COLUMN…
    val exCol = intercept[Exception] {
      sql.run("ALTER TABLE db.woq WRITE ORDERED BY nope DESC")
    }
    assert(exCol.getMessage.contains("unknown column"))
    assert(exCol.getMessage.contains("nope"))
    // …an unparseable item gets the grammar message, not a column error…
    val exGram = intercept[Exception] {
      sql.run("ALTER TABLE db.woq WRITE ORDERED BY v SIDEWAYS")
    }
    assert(exGram.getMessage.contains("cannot parse sort item"))
    // …and an empty column list gets its own message (the r8 error
    // rendered an empty unknown-column list)
    val exEmpty = intercept[Exception] {
      sql.run("ALTER TABLE db.woq WRITE ORDERED BY ()")
    }
    assert(exEmpty.getMessage.contains("at least one column"))
  }

  test("compaction's explicit clustering is not re-sorted by write.sort-order") {
    val sql = freshSql()
    // property says sort by v, but an explicit rewrite sort-order=a must
    // own the output layout (a write-time re-sort would destroy it)
    sql.run("""CREATE TABLE db.zs (a BIGINT, v BIGINT)
               TBLPROPERTIES ('write.sort-order'='v')""")
    val df = sql.catalog.spark.range(0, 500, 1, 2)
      .selectExpr("(id * 13) % 500 AS a", "(id * 37) % 500 AS v")
    sql.catalog.loadTable("db", "zs").get.append(df)
    val res = graft.lake.Procedures.rewriteDataFiles(
      sql.catalog.loadTable("db", "zs").get,
      Map("rewrite-all" -> "true", "sort-order" -> "a"))
    res.table.dataFiles.foreach { f =>
      val as = sql.catalog.spark.read.parquet(f.path)
        .select("a").collect().map(_.getLong(0)).toSeq
      assert(as == as.sorted, "compaction sort-order=a was overridden")
    }
  }

  test("write.sort-order: appended files carry tight per-file bounds") {
    val sql = freshSql()
    sql.run("""CREATE TABLE db.so (id BIGINT, v BIGINT)
               TBLPROPERTIES ('write.sort-order'='V')""")
    // two tasks' worth of interleaved v values: without the write-time
    // sort each file spans the whole domain; with it, rows sort by v
    // inside each task so per-file bounds tighten
    val df = sql.catalog.spark.range(0, 1000, 1, 2)
      .selectExpr("id", "(id * 37) % 1000 AS v")
    sql.catalog.loadTable("db", "so").get.append(df)
    val t = sql.catalog.loadTable("db", "so").get
    val bounds = t.dataFiles.flatMap(_.stats.get("v"))
    assert(bounds.nonEmpty)
    // rows are sorted by v within each written file
    t.dataFiles.foreach { f =>
      val vs = sql.catalog.spark.read.parquet(f.path)
        .select("v").collect().map(_.getLong(0)).toSeq
      assert(vs == vs.sorted, s"file ${f.path} not sorted by v")
    }
  }

  test("LakeSql: catalog-prefixed 3-part names cost one probe (VERDICT r5 #3)") {
    val wh = Files.createTempDirectory("graft-ops-wh")
    var probes = 0
    val cat = new LakeCatalog(spark, wh) {
      override def tableInfo(db: String, table: String) = {
        probes += 1; super.tableInfo(db, table)
      }
    }
    val sql = new LakeSql(cat)
    sql.run("CREATE TABLE db.t (id INT)")
    sql.run("INSERT INTO db.t VALUES (1), (2)")
    probes = 0
    assert(sql.run("SELECT COUNT(*) AS c FROM db.t").head().getLong(0) == 2)
    val plainProbes = probes
    probes = 0
    assert(sql.run("SELECT COUNT(*) AS c FROM glue_catalog.db.t")
      .head().getLong(0) == 2)
    // the catalog prefix is consumed by the rewrite regex; it must not
    // buy an extra (db, t)-shaped path probe over the 2-part spelling
    assert(probes == plainProbes)
    probes = 0
    assert(sql.run("SELECT COUNT(*) AS c FROM lake.db.t").head().getLong(0) == 2)
    assert(probes == plainProbes)
  }

  test("LakeSql: IF NOT EXISTS, INSERT..SELECT, and WHERE-less DML") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.src (id INT, category STRING)")
    sql.run("CREATE TABLE IF NOT EXISTS db.src (id INT, category STRING)") // no-op
    sql.run("INSERT INTO db.src VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    sql.run("CREATE TABLE db.dst (id INT, category STRING)")
    sql.run("INSERT INTO db.dst SELECT id, category FROM db.src WHERE category = 'a'")
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.dst").head().getLong(0) == 2)
    sql.run("UPDATE db.dst SET id = id + 10")
    assert(sql.run("SELECT MIN(id) AS m FROM db.dst").head().getInt(0) == 11)
    sql.run("DELETE FROM db.dst")
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.dst").head().getLong(0) == 0)
  }

  test("LakeSql SELECT rewriting is identifier-boundary-aware (VERDICT r3 #2)") {
    val sql = freshSql()
    // prefix-sharing names: demo.t and demo.t2 must never corrupt each other
    sql.run("CREATE TABLE demo.t (id INT)")
    sql.run("CREATE TABLE demo.t2 (id INT)")
    sql.run("INSERT INTO demo.t VALUES (1)")
    sql.run("INSERT INTO demo.t2 VALUES (10), (20)")
    assert(sql.run("SELECT COUNT(*) AS cnt FROM demo.t2").head().getLong(0) == 2)
    assert(sql.run("SELECT COUNT(*) AS cnt FROM demo.t").head().getLong(0) == 1)
    val joined = sql.run(
      """SELECT a.id AS aid, b.id AS bid FROM demo.t a
         JOIN demo.t2 b ON b.id = a.id * 10""").head()
    assert(joined.getInt(0) == 1 && joined.getInt(1) == 10)
    // prefixed spellings resolve to the same tables, boundary-checked
    assert(sql.run("SELECT COUNT(*) AS cnt FROM lake.demo.t2").head().getLong(0) == 2)
    assert(sql.run("SELECT COUNT(*) AS cnt FROM glue_catalog.demo.t").head().getLong(0) == 1)
    // a string literal containing 'lake.' or a table name must pass through
    val lit = sql.run(
      "SELECT 'lake.demo.t is great' AS msg, COUNT(*) AS cnt FROM demo.t2").head()
    assert(lit.getString(0) == "lake.demo.t is great" && lit.getLong(1) == 2)
    // grants key off real references only: a principal with SELECT on
    // demo.t2 but not demo.t can query t2 (no substring phantom-match)…
    sql.catalog.grant("demo", "t2", "reader2", Seq("SELECT"))
    assert(sql.run("SELECT COUNT(*) AS cnt FROM demo.t2", Some("reader2"))
      .head().getLong(0) == 2)
    // …and is still denied on demo.t itself
    assertThrows[AccessDeniedException](
      sql.run("SELECT COUNT(*) AS cnt FROM demo.t", Some("reader2")))
    // a literal mentioning the denied table must not trigger the check
    assert(sql.run("SELECT 'demo.t' AS s, COUNT(*) AS cnt FROM demo.t2",
      Some("reader2")).head().getLong(1) == 2)
  }

  test("LakeSql: parser hardening — literals, leftover views, atomic ALTER") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.ph (id INT, note STRING)")
    sql.run("INSERT INTO db.ph VALUES (1, 'x'), (2, 'y')")
    // a WHERE inside an assignment's string literal must not split SET
    sql.run("UPDATE db.ph SET note = 'see WHERE clause docs' WHERE id = 1")
    val notes = sql.run("SELECT note FROM db.ph WHERE id = 1")
      .collect().map(_.getString(0)).toSeq
    assert(notes == Seq("see WHERE clause docs"))
    // a table name inside a DOUBLE-quoted literal is a value, not a ref
    val lit = sql.run("""SELECT count(*) AS c FROM db.ph WHERE note = "db.ph"""")
      .head().getLong(0)
    assert(lit == 0)
    // rewriter temp views die with their statement: a later caller
    // cannot name db__ph directly (grants/staleness bypass)
    assertThrows[Exception](sql.run("SELECT * FROM db__ph").collect())
    // ALTER with format-version + another property is ONE commit
    val loc = sql.catalog.loadTable("db", "ph").get.location
    val vBefore = Meta.currentVersion(loc).get
    sql.run("""ALTER TABLE db.ph SET TBLPROPERTIES (
      'format-version'='3', 'write.update.mode'='merge-on-read')""")
    val after = sql.catalog.loadTable("db", "ph").get
    assert(after.meta.formatVersion == 3)
    assert(after.meta.props.get("write.update.mode").contains("merge-on-read"))
    assert(Meta.currentVersion(loc).get == vBefore + 1, "ALTER must be one commit")
  }

  test("LakeSql: INSERT OVERWRITE and TRUNCATE TABLE") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.ow (id INT)")
    sql.run("INSERT INTO db.ow VALUES (1), (2), (3)")
    sql.run("INSERT OVERWRITE db.ow VALUES (9)")
    assert(sql.run("SELECT id FROM db.ow").collect().map(_.getInt(0)).toSeq == Seq(9))
    // the replaced state stays time-travelable until expiry
    assert(sql.run("SELECT COUNT(*) AS c FROM db.ow VERSION AS OF 1")
      .head().getLong(0) == 3)
    sql.run("TRUNCATE TABLE db.ow")
    assert(sql.run("SELECT COUNT(*) AS c FROM db.ow").head().getLong(0) == 0)
    // table remains writable after truncate
    sql.run("INSERT INTO db.ow VALUES (5)")
    assert(sql.run("SELECT COUNT(*) AS c FROM db.ow").head().getLong(0) == 1)
  }

  test("LakeSql: INSERT OVERWRITE a partitioned table") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.owp (id INT, category STRING) PARTITIONED BY (category)")
    sql.run("INSERT INTO db.owp VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    sql.run("INSERT OVERWRITE db.owp VALUES (10, 'c'), (11, 'a')")
    assert(sql.run("SELECT id FROM db.owp ORDER BY id")
      .collect().map(_.getInt(0)).toSeq == Seq(10, 11))
    assert(sql.run("SELECT COUNT(*) AS c FROM db.owp WHERE category = 'c'")
      .head().getLong(0) == 1)
  }

  test("LakeSql: TIMESTAMP AS OF resolves the snapshot current at that instant") {
    val wh = Files.createTempDirectory("graft-ops-tt-wh")
    var now = java.time.Instant.parse("2026-01-01T00:00:00Z").toEpochMilli
    val cat = new LakeCatalog(spark, wh, () => { now += 60000L; now })
    val sql = new LakeSql(cat)
    sql.run("CREATE TABLE db.tt (id INT)")
    sql.run("INSERT INTO db.tt VALUES (1)")
    sql.run("INSERT INTO db.tt VALUES (2)")
    sql.run("INSERT INTO db.tt VALUES (3)")
    // commit instant of the second append, rendered as a SQL timestamp literal
    val t = cat.loadTable("db", "tt").get
    val ts2 = t.history().orderBy("snapshot_id")
      .collect()(1).getTimestamp(1).toInstant
    val lit = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
      .withZone(java.time.ZoneOffset.UTC).format(ts2)
    assert(sql.run(s"SELECT COUNT(*) AS c FROM db.tt TIMESTAMP AS OF '$lit'")
      .head().getLong(0) == 2)
    // before the first commit → clear error
    val e = intercept[IllegalArgumentException] {
      sql.run("SELECT * FROM db.tt TIMESTAMP AS OF '2020-01-01 00:00:00'")
    }
    assert(e.getMessage.contains("no snapshot at or before"))
  }

  test("LakeSql: CREATE TABLE AS SELECT") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.base (id INT, category STRING)")
    sql.run("INSERT INTO db.base VALUES (1, 'a'), (2, 'b'), (3, 'a')")
    sql.run("CREATE TABLE db.derived AS SELECT id, category FROM db.base WHERE category = 'a'")
    assert(sql.run("SELECT COUNT(*) AS c FROM db.derived").head().getLong(0) == 2)
    // the new table is a full lake table: DML works on it
    sql.run("DELETE FROM db.derived WHERE id = 1")
    assert(sql.run("SELECT COUNT(*) AS c FROM db.derived").head().getLong(0) == 1)
    // IF NOT EXISTS short-circuits
    sql.run("CREATE TABLE IF NOT EXISTS db.derived AS SELECT * FROM db.base")
    assert(sql.run("SELECT COUNT(*) AS c FROM db.derived").head().getLong(0) == 1)
  }

  test("LakeSql: MERGE INTO statement (update + insert arms)") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.tgt (id INT, amount DOUBLE)")
    sql.run("INSERT INTO db.tgt VALUES (1, 10.0), (2, 20.0)")
    sql.run("CREATE TABLE db.src (id INT, amount DOUBLE)")
    sql.run("INSERT INTO db.src VALUES (2, 222.0), (3, 33.0)")
    val st = sql.run(
      """MERGE INTO db.tgt a USING db.src b ON a.id = b.id
         WHEN MATCHED THEN UPDATE SET amount = b.amount
         WHEN NOT MATCHED THEN INSERT *""").head().getString(0)
    assert(st.contains("matched=1") && st.contains("inserted=1"), st)
    val rows = sql.run("SELECT id, amount FROM db.tgt ORDER BY id").collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toSeq
    assert(rows == Seq(1 -> 10.0, 2 -> 222.0, 3 -> 33.0))
    // delete arm
    sql.run("""MERGE INTO db.tgt a USING db.src b ON a.id = b.id
               WHEN MATCHED THEN DELETE""")
    assert(sql.run("SELECT COUNT(*) AS c FROM db.tgt").head().getLong(0) == 1)
  }

  test("LakeSql: ADD/DROP COLUMN and the rollback procedure") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.ev (id INT)")
    sql.run("INSERT INTO db.ev VALUES (1), (2)")        // snapshot 1
    sql.run("ALTER TABLE db.ev ADD COLUMN note STRING") // metadata-only
    sql.run("INSERT INTO db.ev VALUES (3, 'x')")        // snapshot 2
    assert(sql.run("SELECT COUNT(*) AS c FROM db.ev WHERE note IS NULL")
      .head().getLong(0) == 2)
    sql.run("ALTER TABLE db.ev DROP COLUMN note")
    assert(sql.run("SELECT * FROM db.ev").columns.toSeq == Seq("id"))
    sql.run("DELETE FROM db.ev WHERE id = 1")           // snapshot 3
    assert(sql.run("SELECT COUNT(*) AS c FROM db.ev").head().getLong(0) == 2)
    sql.run("CALL lake.system.rollback_to_snapshot(" +
      "table => 'db.ev', snapshot_id => '2')")
    assert(sql.run("SELECT COUNT(*) AS c FROM db.ev").head().getLong(0) == 3)
  }

  test("LakeSql: metadata tables — db.t.history / .snapshots / .files") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.mt (id INT)")
    sql.run("INSERT INTO db.mt VALUES (1), (2)")
    sql.run("INSERT INTO db.mt VALUES (3)")
    val hist = sql.run(
      "SELECT operation, snapshot_id FROM db.mt.history ORDER BY snapshot_id")
      .collect()
    assert(hist.map(_.getString(0)).toSeq == Seq("append", "append"))
    assert(sql.run("SELECT COUNT(*) AS c FROM db.mt.snapshots").head().getLong(0) == 2)
    val files = sql.run(
      "SELECT file_path, record_count, column_bounds FROM db.mt.files").collect()
    assert(files.map(_.getLong(1)).sum == 3)
    assert(files.forall(_.getString(2).contains("id:[")))
    // metadata tables join with the data table in one statement
    val joined = sql.run(
      """SELECT (SELECT COUNT(*) FROM db.mt.files) AS nfiles,
                COUNT(*) AS rows FROM db.mt""").head()
    assert(joined.getLong(0) == files.length && joined.getLong(1) == 3)
  }

  test("LakeSql: VERSION AS OF time travel through the dispatcher") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.tt (id INT)")
    sql.run("INSERT INTO db.tt VALUES (1), (2), (3)") // snapshot 1
    sql.run("DELETE FROM db.tt WHERE id = 2")         // snapshot 2
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.tt").head().getLong(0) == 2)
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.tt VERSION AS OF 1")
      .head().getLong(0) == 3)
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.tt VERSION AS OF 2")
      .head().getLong(0) == 2)
    // both spellings in one query: current state joined to history
    val both = sql.run(
      """SELECT (SELECT COUNT(*) FROM db.tt VERSION AS OF 1) AS old_cnt,
                COUNT(*) AS cur_cnt FROM db.tt""").head()
    assert(both.getLong(0) == 3 && both.getLong(1) == 2)
  }

  test("LakeSql: expire_snapshots CALL with TIMESTAMP literal (M3, F3)") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.e (id INT)")
    sql.run("INSERT INTO db.e VALUES (1)")
    sql.run("INSERT INTO db.e VALUES (2)")
    val r = sql.run(
      "CALL lake.system.expire_snapshots(table => 'db.e', " +
        "older_than => TIMESTAMP '2030-01-01 00:00:00', retain_last => 1)").head()
    assert(r.getInt(0) == 1) // one snapshot expired
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.e").head().getLong(0) == 2)
  }

  test("grants gate statements at dispatch; ALL implies everything (M10)") {
    val sql = freshSql()
    sql.run("CREATE TABLE db.g (id INT)")
    sql.run("INSERT INTO db.g VALUES (1), (2)")
    sql.catalog.grant("db", "g", "reader", Seq("SELECT", "DESCRIBE"))
    sql.catalog.grant("db", "g", "admin", Seq("ALL"))
    val reader = Some("reader")
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.g", reader).head().getLong(0) == 2)
    assert(sql.run("DESCRIBE db.g", reader).count() == 1)
    assertThrows[AccessDeniedException](
      sql.run("DELETE FROM db.g WHERE id = 1", reader))
    assertThrows[AccessDeniedException](
      sql.run("INSERT INTO db.g VALUES (3)", reader))
    assertThrows[AccessDeniedException](
      sql.run("DROP TABLE db.g", reader))
    sql.run("DELETE FROM db.g WHERE id = 1", Some("admin"))
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.g", reader).head().getLong(0) == 1)
    // overwrite/truncate decompose to DELETE(+INSERT): reader lacks both
    assertThrows[AccessDeniedException](
      sql.run("INSERT OVERWRITE db.g VALUES (9)", reader))
    assertThrows[AccessDeniedException](
      sql.run("TRUNCATE TABLE db.g", reader))
    sql.run("TRUNCATE TABLE db.g", Some("admin"))
    assert(sql.run("SELECT COUNT(*) AS cnt FROM db.g", reader).head().getLong(0) == 0)
  }

  test("verifier: short-circuits on strict v2-MoR failure, classifies error (§2.12)") {
    val sql = freshSql()
    sql.run("""CREATE TABLE db.v (id INT) TBLPROPERTIES (
      'write.delete.mode'='merge-on-read', 'write.update.mode'='merge-on-read')""")
    sql.run("INSERT INTO db.v VALUES (1), (2), (3)")
    val strict = new Verifier(sql.catalog, strict = true)
    assert(strict.verify("db", "v").ok) // no delete files yet
    sql.run("DELETE FROM db.v WHERE id = 2")
    val report = strict.verify("db", "v")
    assert(!report.ok)
    assert(report.probes.map(_.name) == Seq("describe", "select_limit")) // short-circuit
    assert(report.probes.last.detail.contains("UNSUPPORTED_V2_DELETES"))
    assert(report.probes.last.detail.contains("upgrade"))
    // the engine itself (non-strict) reads fine — the limitation is the reader's
    assert(new Verifier(sql.catalog, strict = false).verify("db", "v").ok)
    // missing table
    assert(!strict.verify("db", "nope").ok)
  }

  test("upgrader: branch structure, --all filter, dry-run, summary (M8/M9)") {
    val sql = freshSql()
    val up = new Upgrader(sql)
    sql.run("""CREATE TABLE db.v2t (id INT) TBLPROPERTIES ('format-version'='2',
      'write.delete.mode'='merge-on-read', 'write.update.mode'='merge-on-read')""")
    sql.run("INSERT INTO db.v2t VALUES (1), (2)")
    sql.run("DELETE FROM db.v2t WHERE id = 1")
    sql.run("CREATE TABLE db.v3t (id INT) TBLPROPERTIES ('format-version'='3')")
    sql.catalog.registerForeignTable("db", "hive_t", "HIVE")

    assert(up.list("db").toSet == Set("v2t" -> "2", "v3t" -> "3"))
    // dry-run: plan text, no execution (upgrade_table.py:74-78)
    val dry = up.upgradeTable("db", "v2t", dryRun = true)
    assert(dry.action == "dry-run" && dry.detail.contains("ALTER TABLE")
      && dry.detail.contains("rewrite_data_files"))
    assert(sql.catalog.loadTable("db", "v2t").get.meta.formatVersion == 2)
    // skip branch (upgrade_table.py:117-119)
    assert(up.upgradeTable("db", "hive_t").action == "skipped")
    assert(up.upgradeTable("db", "missing").action == "failed")
    // --all only touches non-v3 lake tables (upgrade_table.py:205)
    val outcomes = up.upgradeAll("db")
    assert(outcomes.map(_.table) == Seq("db.v2t"))
    assert(outcomes.head.action == "upgraded" && outcomes.head.ok)
    val t = sql.catalog.loadTable("db", "v2t").get
    assert(t.meta.formatVersion == 3 && t.meta.nextRowId >= 0)
    assert(t.deleteFiles.isEmpty) // compacted
    // already-v3 branch → compact-only (upgrade_table.py:121-124)
    assert(up.upgradeTable("db", "v3t").action == "compacted-only")
    val s = up.summary(outcomes)
    assert(s.contains("1/1 succeeded"))
  }

  test("upgrader CLI main: --list and --all against a warehouse (M9)") {
    val wh = Files.createTempDirectory("graft-cli-wh")
    val sql = new LakeSql(new LakeCatalog(spark, wh))
    sql.run("CREATE TABLE db.c1 (id INT) TBLPROPERTIES ('format-version'='2')")
    sql.run("INSERT INTO db.c1 VALUES (1), (2)")
    Upgrader.main(Array("-d", "db", "--list", "--warehouse", wh.toString))
    Upgrader.main(Array("-d", "db", "--all", "--warehouse", wh.toString))
    // main must not have stopped the shared session, and the upgrade ran
    assert(!spark.sparkContext.isStopped)
    val t = sql.catalog.loadTable("db", "c1").get
    assert(t.meta.formatVersion == 3 && t.meta.nextRowId >= 0)
  }

  test("upgrader CLI validates configuration with friendly errors (config.py parity)") {
    def msg(args: Array[String]): String =
      intercept[IllegalArgumentException](Upgrader.main(args)).getMessage
    assert(msg(Array("--bogus")).contains("unknown argument: --bogus"))
    assert(msg(Array("--bogus")).contains("usage:"))
    assert(msg(Array("-d")).contains("missing value for -d"))
    assert(msg(Array("-d", "db", "--warehouse", "/tmp/x")) // no action flag
      .contains("nothing to do"))
    val wh = Files.createTempDirectory("graft-cli-vwh")
    assert(msg(Array("-d", "db", "--list",
      "--warehouse", wh.resolve("nope").toString)).contains("not a directory"))
    if (!sys.env.contains("GRAFT_WAREHOUSE"))
      assert(msg(Array("-d", "db", "--list")).contains("GRAFT_WAREHOUSE"))
  }

  test("demo arc end-to-end: v2 failure → upgrade → v3 success (demo.sh:50-115)") {
    val sql = freshSql()
    val report = new DemoRunner(sql).run()
    assert(report.ok, "\n" + report.render)
    // the pivotal moments, by name
    val byName = report.steps.map(s => s.name -> s.ok).toMap
    assert(byName("strict-read-fails-on-v2-mor"))
    assert(byName("upgrade"))
    assert(byName("strict-read-ok-after-upgrade"))
    assert(byName("v3-delete-count"))
  }
}
