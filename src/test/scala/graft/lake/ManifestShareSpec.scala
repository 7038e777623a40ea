package graft.lake

import java.nio.file.{Files, Path}

import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import org.scalatest.funsuite.AnyFunSuite

/** r10 manifest segment sharing: commits persist O(delta) manifest
  * bytes by re-referencing the parent's surviving segments, instead of
  * rewriting the full live file list every commit (the pre-r10 shape —
  * a 1M-file table paid ~50 MB of manifest per append). Pure
  * metadata-layer tests, no Spark session. */
class ManifestShareSpec extends AnyFunSuite {

  private val mapper =
    JsonMapper.builder().addModule(DefaultScalaModule).build()

  private def file(i: Int) = DataFileMeta(
    path = s"/ext/data/f$i.parquet", rowCount = i.toLong, sizeBytes = 100L + i)

  private def readManifest(p: String): ManifestData =
    mapper.readValue(Files.readString(java.nio.file.Paths.get(p)),
      classOf[ManifestData])

  private def appendChain(loc: Path, n: Int): TableMetadata = {
    var m = Meta.commit(loc, TableMetadata("t", snapshots =
      Seq(Snapshot(1, 1000, "append", dataFiles = Seq(file(1)))),
      currentSnapshotId = 1))
    for (i <- 2 to n) {
      val prev = m.snapshots.last
      val s = Snapshot(i.toLong, 1000L + i, "append",
        dataFiles = prev.dataFiles :+ file(i), parentId = prev.id)
      m = Meta.commit(loc,
        m.copy(snapshots = m.snapshots :+ s, currentSnapshotId = i.toLong))
    }
    m
  }

  test("appends write O(delta) segments and share the parent's by path") {
    val loc = Files.createTempDirectory("graft-seg")
    val m = appendChain(loc, 40)
    // reload materializes the full list, order preserved
    val loaded = Meta.load(loc).get
    assert(loaded.currentSnapshot.get.dataFiles.map(_.path) ==
      (1 to 40).map(i => s"/ext/data/f$i.parquet"))
    // the last commit's top references 40 segments; ITS OWN carries only
    // the one appended file — the O(delta) claim, byte-checkable
    val top = readManifest(m.snapshots.last.manifestPath.get)
    assert(top.dataFiles.isEmpty && top.segments.size == 40)
    val lastSeg = readManifest(top.segments.last)
    assert(lastSeg.dataFiles.map(_.path) == Seq("/ext/data/f40.parquet"))
    // consecutive snapshots share all but the delta segment — same path
    // strings, no copied entries
    val prevTop = readManifest(m.snapshots(38).manifestPath.get)
    assert(top.segments.take(39) == prevTop.segments)
  }

  test("past the segment cap the lists coalesce into one segment") {
    val loc = Files.createTempDirectory("graft-seg-cap")
    val m = appendChain(loc, 70)
    val segCounts = m.snapshots.map(s =>
      readManifest(s.manifestPath.get).segments.size)
    assert(segCounts.max <= 65, s"segment count must stay capped: $segCounts")
    // and the coalesced state still reads back complete
    val loaded = Meta.load(loc).get
    assert(loaded.currentSnapshot.get.dataFiles.size == 70)
  }

  test("a re-stamped file under the same path is never served from a " +
    "reused segment (value-equality guard)") {
    val loc = Files.createTempDirectory("graft-seg-restamp")
    var m = Meta.commit(loc, TableMetadata("t", snapshots =
      Seq(Snapshot(1, 1000, "append", dataFiles = Seq(file(1), file(2)))),
      currentSnapshotId = 1))
    // same paths, one file's metadata re-stamped (e.g. a lineage mint)
    val restamped = Seq(file(1).copy(firstRowId = 7L), file(2))
    m = Meta.commit(loc, m.copy(snapshots = m.snapshots :+
      Snapshot(2, 2000, "replace", dataFiles = restamped, parentId = 1),
      currentSnapshotId = 2))
    val loaded = Meta.load(loc).get
    val got = loaded.currentSnapshot.get.dataFiles.find(_.path.endsWith("f1.parquet")).get
    assert(got.firstRowId == 7L,
      "reused segment served the stale pre-restamp metadata")
  }

  test("a legacy pure-inline manifest is reusable as a child's segment") {
    val loc = Files.createTempDirectory("graft-seg-legacy")
    Files.createDirectories(Meta.metadataDir(loc))
    // forge a pre-r10 manifest: inline lists, no segments field at all
    val legacy = Meta.metadataDir(loc).resolve("manifest-1-legacy.json")
    Files.writeString(legacy,
      """{"dataFiles":[{"path":"/ext/data/f1.parquet","rowCount":1,"sizeBytes":101}],"deleteFiles":[]}""")
    var m = Meta.commit(loc, TableMetadata("t", snapshots =
      Seq(Snapshot(1, 1000, "append", manifestPath = Some(legacy.toString))),
      currentSnapshotId = 1))
    val base = Meta.load(loc).get
    assert(base.currentSnapshot.get.dataFiles.map(_.path) ==
      Seq("/ext/data/f1.parquet"))
    val s2 = Snapshot(2, 2000, "append",
      dataFiles = base.currentSnapshot.get.dataFiles :+ file(2), parentId = 1)
    m = Meta.commit(loc, base.copy(snapshots = base.snapshots :+ s2,
      currentSnapshotId = 2))
    val top = readManifest(m.snapshots.last.manifestPath.get)
    assert(top.segments.contains(legacy.toString),
      s"legacy manifest must be referenced as a segment: ${top.segments}")
    assert(Meta.load(loc).get.currentSnapshot.get.dataFiles.size == 2)
  }

  test("expiry deletes only segments no retained snapshot references") {
    val loc = Files.createTempDirectory("graft-seg-expire")
    var m = appendChain(loc, 10)
    // snapshot 11 OVERWRITES: none of the append segments survive into it
    val s11 = Snapshot(11, 2000, "replace",
      dataFiles = Seq(file(99)), parentId = 10)
    m = Meta.commit(loc,
      m.copy(snapshots = m.snapshots :+ s11, currentSnapshotId = 11))
    def jsonFiles(): Set[String] = {
      val s = Files.list(Meta.metadataDir(loc))
      try {
        import scala.jdk.CollectionConverters._
        s.iterator().asScala.map(_.toString).filter(_.endsWith(".json")).toSet
      } finally s.close()
    }
    val before = jsonFiles()
    val (expired, kept) = m.snapshots.partition(_.id <= 10)
    // same order as Procedures.expireSnapshots: commit the trimmed
    // snapshot list FIRST, then GC what nothing retained references
    m = Meta.commit(loc, m.copy(snapshots = kept))
    Meta.deleteManifests(expired, kept)
    val after = jsonFiles()
    // the survivor still materializes completely from what's left
    assert(Meta.load(loc).get.snapshots.find(_.id == 11L)
      .get.dataFiles.map(_.path) == Seq("/ext/data/f99.parquet"))
    val segs = readManifest(m.snapshots.last.manifestPath.get).segments
    segs.foreach(sp => assert(after.contains(sp) || Files.exists(
      java.nio.file.Paths.get(sp)), s"retained segment deleted: $sp"))
    // every append-era manifest/segment (referenced by nothing retained)
    // is gone — the GC is real, not a no-op
    val deadTops = expired.flatMap(_.manifestPath).toSet
    assert(deadTops.forall(p => !after.contains(p)), "expired tops remain")
    assert(before.size > after.size, "expiry must reclaim manifest files")
  }
}
