package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** M1/M2/M3/M7: upgrade (next-row-id minting), compaction, snapshot
  * expiry + file GC, metadata repair — including the reference's demo arc
  * (strict reader fails on v2 MoR → upgrade+compact → strict reader OK,
  * demo.sh:50-115). */
class ProceduresSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("category", StringType),
    StructField("amount", DoubleType)))

  private def freshCatalog(): LakeCatalog = {
    val wh = Files.createTempDirectory("graft-proc-wh")
    var t = 1700000000000L
    new LakeCatalog(spark, wh, () => { t += 1000; t })
  }

  private def df(rows: (Int, String, Double)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, c, a) => Row(i, c, a) }, 1),
      schema)

  private val morProps = Map(
    "write.delete.mode" -> "merge-on-read",
    "write.update.mode" -> "merge-on-read")

  private def content(t: LakeTable): Set[(Int, String, Double)] =
    t.read().collect().map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet

  private def morTable(cat: LakeCatalog, name: String): LakeTable =
    cat.createTable("db", name, schema, Seq("category"), morProps)
      .append(df((1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "b", 40.0)))
      .delete(col("id") === 2)
      .update(Map("amount" -> (col("amount") + 1)), col("id") === 3)

  test("upgrade mints next-row-id and is idempotent (M1, README.md:41-45)") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val v2 = morTable(cat, "up1")
    assert(v2.meta.nextRowId == -1)
    val v3 = Procedures.upgradeFormatVersion(v2)
    assert(v3.meta.formatVersion == 3)
    assert(v3.meta.props("format-version") == "3")
    // 4 inserted + 1 rewritten-by-update row were assigned implicit ids
    assert(v3.meta.nextRowId == v2.meta.computedNextRowId)
    assert(v3.meta.nextRowId >= 5)
    // invariant: upgrade is metadata-only
    assert(content(v3) == content(v2))
    assert(Procedures.upgradeFormatVersion(v3) eq v3)
    assertThrows[IllegalArgumentException](Procedures.upgradeFormatVersion(v3, 2))
  }

  test("rewrite-all compaction: content invariant, zero delete files (M2, Q5)") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = morTable(cat, "c1")
    assert(t.deleteFiles.nonEmpty)
    val r = Procedures.rewriteDataFiles(t, Map("rewrite-all" -> "true"))
    assert(content(r.table) == content(t))
    assert(r.table.deleteFiles.isEmpty)
    assert(r.removedDeleteFiles == t.deleteFiles.size)
    // compaction is idempotent on an already-clean table with threshold
    val r2 = Procedures.rewriteDataFiles(r.table,
      Map("delete-file-threshold" -> "1"))
    assert(r2.rewrittenDataFiles == 0)
  }

  test("delete-file-threshold rewrites only files with associated deletes") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "c2", schema, Seq("category"), morProps)
      .append(df((1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)))
      .delete(col("id") === 1) // touches only partition a's file
    val clean = t.dataFiles.filter(_.partitionValues("category") != "a")
    val r = Procedures.rewriteDataFiles(t, Map("delete-file-threshold" -> "1"))
    assert(r.rewrittenDataFiles == 1)
    assert(r.table.deleteFiles.isEmpty)
    // untouched files carried over byte-identical
    assert(clean.map(_.path).toSet.subsetOf(r.table.dataFiles.map(_.path).toSet))
    assert(content(r.table) == content(t))
  }

  test("where-scoped compaction rewrites only might-match files (partition " +
    "pruning ∩ stats skipping), out-of-scope files byte-identical") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "cw", schema, Seq("category"))
      .append(df((1, "a", 10.0), (2, "a", 20.0)))
      .append(df((3, "b", 30.0), (4, "b", 40.0)))
      .append(df((5, "c", 50.0)))
    val before = t.dataFiles.map(_.path).toSet
    val bFiles = t.dataFiles.filter(_.partitionValues.get("category").contains("b"))
      .map(_.path).toSet
    assert(bFiles.nonEmpty && bFiles.size < before.size)

    val r = Procedures.rewriteDataFiles(t,
      Map("rewrite-all" -> "true", "where" -> "category = 'b'"))
    val after = r.table.dataFiles.map(_.path).toSet
    // b-partition files rewritten; every other file carried over untouched
    assert((bFiles & after).isEmpty, "in-scope files must be replaced")
    assert((before -- bFiles).subsetOf(after),
      "out-of-scope files must carry over byte-identical")
    assert(content(r.table) == content(t))

    // a predicate matching nothing rewrites nothing
    val r2 = Procedures.rewriteDataFiles(r.table,
      Map("rewrite-all" -> "true", "where" -> "category = 'zzz'"))
    assert(r2.rewrittenDataFiles == 0)

    // a typo'd column fails loudly instead of silently scoping to nothing
    intercept[Exception] {
      Procedures.rewriteDataFiles(r.table,
        Map("rewrite-all" -> "true", "where" -> "no_such_col = 1"))
    }
  }

  test("demo arc: strict v2 failure → upgrade + compact → strict success (demo.sh)") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val v2 = morTable(cat, "arc1")
    assertThrows[UnsupportedV2DeletesException](v2.read(strict = true))
    // the reference's upgrade path: ALTER format-version, then compact
    val v3 = Procedures.upgradeFormatVersion(v2)
    val compacted = Procedures.rewriteDataFiles(v3, Map("rewrite-all" -> "true")).table
    val strictRows = compacted.read(strict = true).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getDouble(2))).toSet
    assert(strictRows == content(v2))
    // post-upgrade v3 MoR delete works and stays strict-readable
    // (test_v3_mor_deletes.py:37-49)
    val afterV3Delete = compacted.delete(col("id") === 1)
    assert(afterV3Delete.read(strict = true).count() == content(v2).size - 1)
  }

  test("expire_snapshots GCs files of expired snapshots only (M3, README.md:33-38)") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = morTable(cat, "e1")
    val expected = content(t) // capture before the old files are GC'd
    val compacted = Procedures.rewriteDataFiles(t, Map("rewrite-all" -> "true")).table
    val oldFiles = t.dataFiles.map(_.path) ++ t.deleteFiles.map(_.path)
    // far-future cutoff, retain only the latest (README.md:36-37 example)
    val r = Procedures.expireSnapshots(compacted,
      olderThanMs = Long.MaxValue, retainLast = 1)
    assert(r.expiredSnapshots == compacted.meta.snapshots.size - 1)
    assert(r.table.meta.snapshots.map(_.id) == Seq(compacted.currentSnapshot.get.id))
    // old-only files are gone; current snapshot's files survive
    assert(oldFiles.forall(p => !Files.exists(Paths.get(p))))
    assert(r.table.dataFiles.forall(p => Files.exists(Paths.get(p.path))))
    // expired snapshots' manifests are GC'd; the survivor's remains
    val expiredManifests = compacted.meta.snapshots
      .filterNot(s => r.table.meta.snapshots.map(_.id).contains(s.id))
      .flatMap(_.manifestPath)
    assert(expiredManifests.nonEmpty)
    assert(expiredManifests.forall(p => !Files.exists(Paths.get(p))))
    assert(r.table.meta.snapshots.flatMap(_.manifestPath)
      .forall(p => Files.exists(Paths.get(p))))
    assert(content(r.table) == expected)
    // no-op when nothing qualifies
    assert(Procedures.expireSnapshots(r.table, 0L, 1).expiredSnapshots == 0)
  }

  test("expire_snapshots honors the table's retention-policy properties") {
    val cat = freshCatalog(); cat.createNamespace("db")
    // fixture clock stamps commits at 1700000000000 + n*1000
    var t = cat.createTable("db", "ret", schema, props = Map(
      "history.expire.max-snapshot-age-ms" -> "1",
      "history.expire.min-snapshots-to-keep" -> "2"))
    t = t.append(df((1, "a", 1.0))).append(df((2, "b", 2.0)))
      .append(df((3, "c", 3.0)))
    val sql = new LakeSql(cat)
    // bare CALL: every snapshot is far older than 1 ms, but the policy's
    // min-snapshots-to-keep floor retains the last two
    sql.run("CALL expire_snapshots(table => 'db.ret')")
    val after = cat.loadTable("db", "ret").get
    assert(after.meta.snapshots.size == 2)
    // explicit args still override the policy (keep 1)
    sql.run("CALL expire_snapshots(table => 'db.ret', retain_last => 1)")
    assert(cat.loadTable("db", "ret").get.meta.snapshots.size == 1)
    // without properties the bare CALL keeps only the latest (pre-M53
    // behavior unchanged)
    cat.createTable("db", "ret2", schema)
      .append(df((1, "a", 1.0))).append(df((2, "b", 2.0)))
    sql.run("CALL expire_snapshots(table => 'db.ret2')")
    assert(cat.loadTable("db", "ret2").get.meta.snapshots.size == 1)
  }

  test("compaction commits through the table clock: monotone timestamps, expirable") {
    // VERDICT r3 wrong #4: a wall-clock compaction snapshot sorts out of
    // order against fixture-clock commits and confuses expiry cutoffs.
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = morTable(cat, "clk1") // snapshots at +1s, +2s, +3s (fixture clock)
    val expected = content(t) // capture before expiry GCs the old files
    val compacted = Procedures.rewriteDataFiles(t, Map("rewrite-all" -> "true")).table
    val stamps = compacted.meta.snapshots.sortBy(_.id).map(_.timestampMs)
    assert(stamps == stamps.sorted, s"non-monotone snapshot timestamps: $stamps")
    assert(stamps.last == 1700000000000L + 4000, s"compaction ignored clock: $stamps")
    // a cutoff between the last DML and the compaction expires exactly
    // the three DML snapshots and keeps the compaction one
    val r = Procedures.expireSnapshots(compacted,
      olderThanMs = 1700000000000L + 3500, retainLast = 1)
    assert(r.expiredSnapshots == 3)
    assert(r.table.meta.snapshots.map(_.operation) == Seq("replace"))
    assert(content(r.table) == expected)
  }

  test("sort-ordered compaction clusters files so stats skip ranges") {
    import org.apache.spark.sql.sources.GreaterThan
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "so", schema, props = morProps)
    // interleaved appends: both files span the whole id range
    t = t.append(df((1, "a", 1.0), (100, "a", 2.0)))
    t = t.append(df((2, "b", 3.0), (101, "b", 4.0)))
    def prunedCount(tt: LakeTable) = tt.read(fileFilter =
      StatsPruning.filePredicate(schema, Seq(GreaterThan("id", 50))))
      .inputFiles.length
    assert(prunedCount(t) == 2, "unclustered files should not be skippable")
    val half = t.dataFiles.map(_.sizeBytes).sum / 2 + 1
    val r = Procedures.rewriteDataFiles(t, Map(
      "rewrite-all" -> "true", "sort-order" -> "id",
      "target-file-size-bytes" -> half.toString))
    assert(r.addedDataFiles >= 2)
    // range partitioning makes id bounds disjoint → the range skips files
    assert(prunedCount(r.table) < r.table.dataFiles.size)
    assert(r.table.read().collect().map(_.getInt(0)).sorted.toSeq
      == Seq(1, 2, 100, 101))
  }

  test("zorder compaction localizes file bounds in EVERY listed dimension") {
    import org.apache.spark.sql.sources.GreaterThan
    val cat = freshCatalog(); cat.createNamespace("db")
    // an 8x8 grid over (id, amount): under a lexical sort by id, every
    // file spans the FULL amount range and stats can never skip on it
    val grid = for (x <- 0 until 8; y <- 0 until 8) yield (x, "g", y.toDouble)
    var t = cat.createTable("db", "zo", schema, props = morProps)
      .append(df(new scala.util.Random(42).shuffle(grid): _*))
    val quarter = t.dataFiles.map(_.sizeBytes).sum / 4 + 1
    // mixed-case spelling: column resolution is case-insensitive like
    // every other engine surface
    val r = Procedures.rewriteDataFiles(t, Map(
      "rewrite-all" -> "true", "sort-order" -> "zorder(ID, Amount)",
      "target-file-size-bytes" -> quarter.toString))
    assert(r.addedDataFiles >= 3, s"expected ~4 output files: $r")
    // content invariant
    assert(r.table.read().collect()
      .map(row => (row.getInt(0), row.getDouble(2))).sorted.toSeq
      == grid.map(g => (g._1, g._3)).sorted)
    // z-clustering localizes BOTH dimensions: a range predicate on
    // either column must skip at least the opposite-quadrant file(s)
    def kept(pred: org.apache.spark.sql.sources.Filter) = r.table.dataFiles
      .count(StatsPruning.filePredicate(schema, Seq(pred)))
    assert(kept(GreaterThan("id", 5)) < r.table.dataFiles.size,
      "id range must skip files after zorder")
    assert(kept(GreaterThan("amount", 5.5)) < r.table.dataFiles.size,
      "amount range must skip files after zorder — the non-leading " +
        "dimension is the whole point of the curve")
    // misuse fails by name, not by silent hash-clustering
    assertThrows[IllegalArgumentException](Procedures.rewriteDataFiles(
      r.table, Map("rewrite-all" -> "true", "sort-order" -> "zorder(id)")))
    assertThrows[IllegalArgumentException](Procedures.rewriteDataFiles(
      r.table, Map("rewrite-all" -> "true",
        "sort-order" -> "zorder(id, category)")))
  }

  test("remove_orphan_files deletes only unreferenced files") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = morTable(cat, "or1")
    val orphan = t.location.resolve("data").resolve("orphan.parquet")
    Files.write(orphan, Array[Byte](1, 2, 3))
    val before = content(t)
    // The default cutoff (now − 3 days) must leave a freshly written file
    // alone — that age guard is what protects in-flight commits from
    // being swept as orphans (ADVICE r5 #4).
    assert(Procedures.removeOrphanFiles(t) == 0)
    assert(Files.exists(orphan))
    // With a future cutoff the fresh orphan is eligible and deleted.
    val futureCutoff = System.currentTimeMillis() + 1000L
    assert(Procedures.removeOrphanFiles(t, olderThanMs = futureCutoff) == 1)
    assert(!Files.exists(orphan))
    assert(t.dataFiles.forall(f => Files.exists(Paths.get(f.path))))
    assert(t.deleteFiles.forall(f => Files.exists(Paths.get(f.path))))
    assert(content(t) == before)
    assert(Procedures.removeOrphanFiles(t, olderThanMs = futureCutoff) == 0) // idempotent
  }

  test("repairV3Metadata re-mints a missing next-row-id (M7, README.md:43-45)") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val v3 = Procedures.upgradeFormatVersion(morTable(cat, "r1t"))
    // brick it the way the README describes: v3 without next-row-id
    val bricked = v3.withMeta(v3.meta.copy(nextRowId = -1L))
    assertThrows[MissingRowLineageException](bricked.read())
    val repaired = Procedures.repairV3Metadata(bricked)
    assert(repaired.meta.nextRowId == v3.meta.nextRowId)
    assert(content(repaired) == content(v3))
    // repair also recovers ids persisted as physical _row_id columns
    val compacted = Procedures.rewriteDataFiles(repaired,
      Map("rewrite-all" -> "true")).table
    val rebricked = compacted.withMeta(compacted.meta.copy(nextRowId = -1L))
    assert(Procedures.repairV3Metadata(rebricked).meta.nextRowId
      >= v3.meta.nextRowId)
  }

  test("compaction preserves v3 row lineage through explicit _row_id columns") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val v3 = Procedures.upgradeFormatVersion(morTable(cat, "lin1"))
    val before = v3.readWithRowIds().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val compacted = Procedures.rewriteDataFiles(v3, Map("rewrite-all" -> "true")).table
    val after = compacted.readWithRowIds().select("id", "_row_id").collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(after == before)
  }

  test("rewrite_manifests coalesces an append chain's segments; " +
    "history snapshots keep materializing") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "rm", schema).append(df((1, "a", 1.0)))
    (2 to 8).foreach(i =>
      t = cat.loadTable("db", "rm").get.append(df((i, "a", i.toDouble))))
    val t0 = cat.loadTable("db", "rm").get
    assert(Meta.segmentCount(t0.currentSnapshot.get) == 8)
    val (t1, before, after) = Procedures.rewriteManifests(t0)
    assert(before == 8 && after == 1)
    // reload: coalesced current reads complete; HISTORY snapshots still
    // materialize (their manifests and shared segments survived the GC)
    val re = cat.loadTable("db", "rm").get
    assert(Meta.segmentCount(re.currentSnapshot.get) == 1)
    assert(content(re) == (1 to 8).map(i => (i, "a", i.toDouble)).toSet)
    val mid = re.meta.snapshots.sortBy(_.id).apply(3)
    assert(mid.dataFiles.nonEmpty, "history snapshot lost its manifest")
    assert(re.readSnapshot(mid.id).count() == 4)
    // idempotent: a second call is a no-op
    val (_, b2, a2) = Procedures.rewriteManifests(t1)
    assert(b2 == 1 && a2 == 1)
    // the dispatcher CALL surface returns the same counts
    val sql = new LakeSql(cat)
    t = cat.loadTable("db", "rm").get.append(df((9, "b", 9.0)))
    val r = sql.run("CALL rewrite_manifests(table => 'db.rm')").head()
    assert(r.getInt(0) == 2 && r.getInt(1) == 1)
  }

  test("remove_orphan_files sweeps crashed-writer manifest orphans, " +
    "never referenced ones") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "mo", schema).append(df((1, "a", 1.0)))
    t = cat.loadTable("db", "mo").get.append(df((2, "b", 2.0)))
    val metaDir = Meta.metadataDir(t.location)
    // forge what a crashed loser leaves behind: manifest + segment files
    // no version references
    val orphanTop = metaDir.resolve("manifest-99-deadbeef.json")
    val orphanSeg = metaDir.resolve("segment-99-deadbeef.json")
    Files.writeString(orphanSeg, """{"dataFiles":[],"deleteFiles":[]}""")
    Files.writeString(orphanTop,
      s"""{"dataFiles":[],"deleteFiles":[],"segments":["$orphanSeg"]}""")
    val old = java.nio.file.attribute.FileTime.fromMillis(1000L)
    Files.setLastModifiedTime(orphanTop, old)
    Files.setLastModifiedTime(orphanSeg, old)
    val n = Procedures.removeOrphanFiles(t, System.currentTimeMillis())
    assert(n >= 2, s"expected both forged orphans swept, got $n")
    assert(!Files.exists(orphanTop) && !Files.exists(orphanSeg))
    // every referenced manifest survived: the table still reads fully
    val re = cat.loadTable("db", "mo").get
    assert(content(re) == Set((1, "a", 1.0), (2, "b", 2.0)))
    assert(re.meta.snapshots.forall(_.dataFiles.nonEmpty))
  }

  test("rewrite_manifests never strands a concurrent reader holding the " +
    "just-superseded metadata version (ADVICE r10)") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "rs", schema).append(df((1, "a", 1.0)))
    (2 to 5).foreach(i =>
      t = cat.loadTable("db", "rs").get.append(df((i, "a", i.toDouble))))
    val t0 = cat.loadTable("db", "rs").get
    val oldVersion = Meta.currentVersion(t0.location).get
    val oldVersionFile =
      Meta.metadataDir(t0.location).resolve(s"v$oldVersion.metadata.json")
    val oldTop = t0.currentSnapshot.get.manifestPath.get
    val oldPaths = Meta.manifestWithSegments(oldTop)
    assert(oldPaths.size >= 2) // top + at least one shared segment
    Procedures.rewriteManifests(t0)
    // the superseded top (and its segments) must SURVIVE: the old
    // version file still names them as this live snapshot's manifest
    oldPaths.foreach(p => assert(Files.exists(Paths.get(p)),
      s"superseded manifest $p deleted while v$oldVersion references it"))
    // a racing reader that loaded v$oldVersion can still materialize
    // every snapshot in it — the exact FileNotFound ADVICE r10 described
    val oldMeta = Meta.fromJson(Files.readString(oldVersionFile))
    oldMeta.snapshots.foreach { s =>
      assert(Meta.materialize(s).dataFiles.nonEmpty,
        s"old-version snapshot ${s.id} lost its file list")
    }
    // the orphan sweep honors the same keep-set: even with a future
    // cutoff nothing referenced is swept...
    val future = System.currentTimeMillis() + 1000L
    Procedures.removeOrphanFiles(cat.loadTable("db", "rs").get, future)
    oldPaths.foreach(p => assert(Files.exists(Paths.get(p))))
    // ...until version retention retires the old version files, at which
    // point the sweep reclaims the superseded manifests
    val sql = new LakeSql(cat)
    sql.run("ALTER TABLE db.rs SET TBLPROPERTIES (" +
      "'write.metadata.delete-after-commit.enabled'='true'," +
      "'write.metadata.previous-versions-max'='1')")
    t = cat.loadTable("db", "rs").get.append(df((6, "b", 6.0)))
    t = cat.loadTable("db", "rs").get.append(df((7, "b", 7.0)))
    assert(!Files.exists(oldVersionFile), "retention should retire old vN")
    Procedures.removeOrphanFiles(cat.loadTable("db", "rs").get, future)
    assert(!Files.exists(Paths.get(oldTop)),
      "orphan sweep should reclaim the superseded top once unreferenced")
    // and the live table still reads completely
    assert(content(cat.loadTable("db", "rs").get) ==
      (1 to 7).map(i => (i, if (i <= 5) "a" else "b", i.toDouble)).toSet)
  }

  test("metadata version retention retires old version files " +
    "(write.metadata.delete-after-commit.enabled)") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "vr", schema,
      props = Map(
        "write.metadata.delete-after-commit.enabled" -> "true",
        "write.metadata.previous-versions-max" -> "2"))
      .append(df((1, "a", 1.0)))
    (2 to 6).foreach(i =>
      t = cat.loadTable("db", "vr").get.append(df((i, "a", i.toDouble))))
    val cur = Meta.currentVersion(t.location).get
    val dir = Meta.metadataDir(t.location)
    (1 to cur).foreach { v =>
      val exists = Files.exists(dir.resolve(s"v$v.metadata.json"))
      assert(exists == (v >= cur - 2),
        s"v$v exists=$exists, want ${v >= cur - 2} (cur=$cur)")
    }
    // retention retires version FILES only: every snapshot still
    // materializes and time travel through retained snapshots works
    val re = cat.loadTable("db", "vr").get
    assert(content(re) == (1 to 6).map(i => (i, "a", i.toDouble)).toSet)
    assert(re.meta.snapshots.forall(_.dataFiles.nonEmpty))
    val first = re.meta.snapshots.minBy(_.id)
    assert(re.readSnapshot(first.id).count() == 1)
  }

  test("metadata_log lists the version trail on both SQL surfaces") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "ml", schema).append(df((1, "a", 1.0)))
    t = cat.loadTable("db", "ml").get.append(df((2, "b", 2.0)))
    val sql = new LakeSql(cat)
    val rows = sql.run("SELECT version, is_current FROM db.ml.metadata_log " +
      "ORDER BY version").collect()
      .map(r => (r.getInt(0), r.getBoolean(1))).toSeq
    // create + 2 appends = 3 metadata versions, only the last current
    assert(rows == Seq((1, false), (2, false), (3, true)), rows.toString)
    val native = spark.sql(
      "SELECT version, metadata_file FROM lake.db.ml.metadata_log " +
        "ORDER BY version").collect()
    assert(native.length == 3 &&
      native.forall(_.getString(1).endsWith(".metadata.json")))
  }
}
