package graft.lake

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.json.JsonMapper
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** Versioned-table metadata model — the Spark-native restatement of the
  * Iceberg v2/v3 metadata the reference manipulates
  * (/root/reference/internal/upgrade_table.py:43-56, README.md:15,43-45).
  *
  * A table = an ordered snapshot log; each snapshot is a full listing of
  * live data files + delete files. Commits are new `vN.metadata.json`
  * files made current by an atomic pointer move (single-writer, like the
  * reference's single-driver model, SURVEY.md §7.4).
  *
  * Scale note: snapshots here inline their file lists; at 100 TB the file
  * listing would move to per-snapshot manifest files referenced by path
  * (same commit protocol, O(1) metadata JSON). The read/planning code only
  * ever touches `currentSnapshot`, so that swap is local to this file.
  */
final case class DataFileMeta(
    path: String,
    partitionValues: Map[String, String] = Map.empty,
    rowCount: Long = 0L,
    sizeBytes: Long = 0L,
    /** v3 row lineage: first row id in this file; rows are
      * firstRowId .. firstRowId+rowCount-1 in file order. -1 when the file
      * instead carries an explicit `_row_id` column (explicitRowIds). */
    firstRowId: Long = -1L,
    /** Rewritten/updated files persist `_row_id` as a physical column so
      * lineage survives compaction and CoW (row ids must be preserved when
      * rows are copied — Iceberg v3 row-lineage semantics). */
    explicitRowIds: Boolean = false,
    /** Commit order: the sequence number of the snapshot that added this
      * file. Governs which equality deletes apply (strictly-older rule). */
    dataSequenceNumber: Long = 0L)

final case class DeleteFileMeta(
    path: String,
    /** "position" (file_path, pos) or "equality" (equalityCols). */
    kind: String = "position",
    rowCount: Long = 0L,
    equalityCols: Seq[String] = Nil,
    /** Equality deletes apply only to data files with a strictly lower
      * sequence number — a key re-inserted after the delete stays live. */
    dataSequenceNumber: Long = 0L)

final case class Snapshot(
    id: Long,
    timestampMs: Long,
    operation: String,
    dataFiles: Seq[DataFileMeta] = Nil,
    deleteFiles: Seq[DeleteFileMeta] = Nil,
    summary: Map[String, String] = Map.empty,
    sequenceNumber: Long = 0L)

final case class TableMetadata(
    name: String,
    /** "LAKE" for our Iceberg-like tables; anything else is skipped by the
      * upgrade driver (table_type filter, upgrade_table.py:51,117). */
    tableType: String = "LAKE",
    formatVersion: Int = 2,
    schemaDdl: String = "",
    partitionCols: Seq[String] = Nil,
    props: Map[String, String] = Map.empty,
    snapshots: Seq[Snapshot] = Nil,
    currentSnapshotId: Long = -1L,
    /** v3 row-lineage high-water mark. -1 = not minted (a v3 table with
      * -1 is "bricked" exactly like README.md:43-45 describes; see
      * Procedures.repairV3Metadata). */
    nextRowId: Long = -1L,
    lastSequenceNumber: Long = 0L,
    grants: Map[String, Seq[String]] = Map.empty) {

  def currentSnapshot: Option[Snapshot] =
    snapshots.find(_.id == currentSnapshotId)

  def schema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType.fromDDL(schemaDdl)

  /** Highest row id ever assigned + 1, recomputed from file metadata
    * (used when minting/repairing `nextRowId`). */
  def computedNextRowId: Long = {
    val ids = snapshots.flatMap(_.dataFiles).filter(_.firstRowId >= 0)
    if (ids.isEmpty) 0L else ids.map(f => f.firstRowId + f.rowCount).max
  }
}

/** JSON persistence + atomic pointer commit for table metadata. */
object Meta {
  private val mapper = JsonMapper.builder().addModule(DefaultScalaModule).build()

  def toJson(m: TableMetadata): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(m)

  def fromJson(s: String): TableMetadata =
    mapper.readValue(s, classOf[TableMetadata])

  def metadataDir(tableLocation: Path): Path = tableLocation.resolve("metadata")
  private def versionFile(tableLocation: Path, v: Int): Path =
    metadataDir(tableLocation).resolve(s"v$v.metadata.json")
  private def hintFile(tableLocation: Path): Path =
    metadataDir(tableLocation).resolve("version-hint.text")

  def currentVersion(tableLocation: Path): Option[Int] = {
    val hint = hintFile(tableLocation)
    if (Files.exists(hint))
      Some(new String(Files.readAllBytes(hint), StandardCharsets.UTF_8).trim.toInt)
    else None
  }

  def load(tableLocation: Path): Option[TableMetadata] =
    currentVersion(tableLocation).map { v =>
      fromJson(new String(
        Files.readAllBytes(versionFile(tableLocation, v)), StandardCharsets.UTF_8))
    }

  /** Commit: write vN+1 metadata, then atomically swing the pointer.
    * Returns the committed version. Fails if a concurrent commit won the
    * pointer race (optimistic, single-writer expected). */
  def commit(tableLocation: Path, m: TableMetadata): Int = {
    val dir = metadataDir(tableLocation)
    Files.createDirectories(dir)
    val base = currentVersion(tableLocation).getOrElse(0)
    val next = base + 1
    val target = versionFile(tableLocation, next)
    if (Files.exists(target))
      throw new IllegalStateException(
        s"concurrent commit detected: $target already exists")
    Files.write(target, toJson(m).getBytes(StandardCharsets.UTF_8))
    val tmp = dir.resolve(s".version-hint.$next.tmp")
    Files.write(tmp, next.toString.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, hintFile(tableLocation), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    next
  }
}
