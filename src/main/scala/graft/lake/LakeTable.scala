package graft.lake

import java.net.URLDecoder
import java.nio.file.{Files, Path}
import java.util.UUID

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Thrown when a strict (v2-MoR-incapable) reader hits live v2 delete
  * files — reproducing the "Databricks cannot read V2 merge-on-read
  * delete files" failure the reference exists to fix
  * (/root/reference/README.md:5-7). */
class UnsupportedV2DeletesException(msg: String) extends RuntimeException(msg)

/** Thrown for a v3 table whose metadata was never assigned `next-row-id`
  * (/root/reference/README.md:43-45 — the "bricked table" case). */
class MissingRowLineageException(msg: String) extends RuntimeException(msg)

/** A versioned lake table on Spark primitives.
  *
  * Reads are MoR-aware: the scan unions the current snapshot's data files
  * and anti-joins position deletes on (`_metadata.file_path`,
  * `_metadata.row_index`) — the same (file, pos) coordinates Iceberg
  * position deletes use (SURVEY.md §4.3). Delete sides are broadcast
  * (deletes ≪ data). Writes produce immutable parquet data files; every
  * mutation is a new snapshot committed via Meta.commit.
  *
  * Partition handling: partition columns are kept *inside* the data files
  * (like Iceberg) and additionally mirrored into hive-style
  * `__p_<col>=<val>/` directories at write time, whose values are recorded
  * per-file in metadata — so partition pruning is a metadata-only file
  * selection (no directory listing) and scans never depend on Spark
  * partition discovery.
  */
class LakeTable(
    val spark: SparkSession,
    val location: Path,
    val meta: TableMetadata,
    clock: () => Long = () => System.currentTimeMillis()) {

  import LakeTable._

  def schema: StructType = meta.schema
  def name: String = meta.name
  def currentSnapshot: Option[Snapshot] = meta.currentSnapshot
  def dataFiles: Seq[DataFileMeta] = currentSnapshot.map(_.dataFiles).getOrElse(Nil)
  def deleteFiles: Seq[DeleteFileMeta] = currentSnapshot.map(_.deleteFiles).getOrElse(Nil)

  private def isMorDelete: Boolean =
    meta.props.getOrElse("write.delete.mode", "copy-on-write") == "merge-on-read"
  private def isMorUpdate: Boolean =
    meta.props.getOrElse("write.update.mode", "copy-on-write") == "merge-on-read"

  // ------------------------------------------------------------------ read

  /** MoR-aware scan of the current snapshot.
    *
    * @param strict model a reader without v2 delete-file support
    *               (README.md:5-7): throws if v2 + live delete files.
    * @param partitionFilter metadata-level partition pruning: only data
    *               files whose recorded partition values satisfy the
    *               predicate are scanned.
    */
  def read(
      strict: Boolean = false,
      partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame = {
    if (strict && meta.formatVersion == 2 && deleteFiles.nonEmpty)
      throw new UnsupportedV2DeletesException(
        s"table ${meta.name} is format-version 2 with ${deleteFiles.size} " +
          "merge-on-read delete file(s); strict readers cannot scan it " +
          "(upgrade to v3 + compact)")
    if (meta.formatVersion == 3 && meta.nextRowId < 0)
      throw new MissingRowLineageException(
        s"table ${meta.name} is format-version 3 but metadata has no " +
          "next-row-id; run repairV3Metadata")
    readWithCoords(partitionFilter).select(schema.fieldNames.map(col): _*)
  }

  /** Live rows plus their physical coordinates (__fp, __pos) — the input
    * to MoR DML (positions of matched rows become the delete file). */
  private[lake] def readWithCoords(
      partitionFilter: Map[String, String] => Boolean = _ => true): DataFrame = {
    val files = dataFiles.filter(f => partitionFilter(f.partitionValues))
    if (files.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema.fields :+ StructField(FileCol, StringType)
          :+ StructField(PosCol, LongType)))
    val base = spark.read.schema(schema).parquet(files.map(_.path): _*)
      .withColumn(FileCol, col("_metadata.file_path"))
      .withColumn(PosCol, col("_metadata.row_index"))
    applyDeletes(base)
  }

  private def applyDeletes(base: DataFrame): DataFrame = {
    val posDeletes = deleteFiles.filter(_.kind == "position")
    val afterPos =
      if (posDeletes.isEmpty) base
      else {
        val del = spark.read.schema(DeleteSchema).parquet(posDeletes.map(_.path): _*)
        base.join(broadcast(del),
          base(FileCol) === del("file_path") && base(PosCol) === del("pos"),
          "left_anti")
      }
    deleteFiles.filter(_.kind == "equality").foldLeft(afterPos) { (df, ef) =>
      val del = spark.read.parquet(ef.path).select(ef.equalityCols.map(col): _*)
      df.join(broadcast(del), ef.equalityCols, "left_anti")
    }
  }

  /** Scan with the v3 `_row_id` lineage column (firstRowId + row_index). */
  def readWithRowIds(): DataFrame = {
    if (meta.formatVersion < 3)
      throw new IllegalStateException("row lineage requires format-version 3")
    if (meta.nextRowId < 0)
      throw new MissingRowLineageException(s"${meta.name}: next-row-id not minted")
    val byPath = dataFiles.map(f => f.path -> f.firstRowId).toMap
    val firstId = udf((p: String) => byPath.getOrElse(stripScheme(p), -1L))
    readWithCoords()
      .withColumn("_row_id", firstId(col(FileCol)) + col(PosCol))
      .select((schema.fieldNames.map(col) :+ col("_row_id")): _*)
  }

  // ----------------------------------------------------------------- write

  /** Physically write `df` as immutable parquet data files under a fresh
    * commit directory; returns their metadata (no snapshot commit).
    * Partition columns are mirrored to `__p_<col>=` dirs and kept in-file.
    */
  private[lake] def writeDataFiles(df: DataFrame, firstRowId: Long): Seq[DataFileMeta] = {
    val commitDir = location.resolve("data").resolve(UUID.randomUUID().toString)
    val cols = schema.fieldNames
    val partCopies = meta.partitionCols.map(c => PartPrefix + c)
    val out = meta.partitionCols.foldLeft(df.select(cols.map(col): _*)) {
      (d, c) => d.withColumn(PartPrefix + c, col(c))
    }
    val writer = out.write.mode("append")
    (if (partCopies.nonEmpty) writer.partitionBy(partCopies: _*) else writer)
      .parquet(commitDir.toString)

    val paths = listParquetFiles(commitDir).sorted
    if (paths.isEmpty) return Nil
    // one job for all per-file row counts (no per-file footer reads)
    val counts = spark.read.schema(schema).parquet(paths.map(_.toString): _*)
      .groupBy(col("_metadata.file_path").as("fp")).count()
      .collect().map(r => stripScheme(r.getString(0)) -> r.getLong(1)).toMap
    var rowId = firstRowId
    paths.map { p =>
      val n = counts.getOrElse(p.toString, 0L)
      val m = DataFileMeta(
        path = p.toString,
        partitionValues = partitionValuesFromPath(p),
        rowCount = n,
        sizeBytes = Files.size(p),
        firstRowId = rowId)
      rowId += n
      m
    }
  }

  private def newSnapshot(
      op: String,
      data: Seq[DataFileMeta],
      deletes: Seq[DeleteFileMeta],
      summary: Map[String, String] = Map.empty): Snapshot = {
    val id = meta.snapshots.map(_.id).foldLeft(0L)(math.max) + 1
    Snapshot(id, clock(), op, data, deletes, summary)
  }

  private[lake] def commitSnapshot(
      snap: Snapshot,
      transform: TableMetadata => TableMetadata = identity): LakeTable = {
    val m = transform(meta).copy(
      snapshots = meta.snapshots :+ snap, currentSnapshotId = snap.id)
    Meta.commit(location, m)
    new LakeTable(spark, location, m, clock)
  }

  /** INSERT INTO / append: new snapshot adding data files (S4). */
  def append(df: DataFrame): LakeTable = {
    val start = if (meta.nextRowId >= 0) meta.nextRowId else meta.computedNextRowId
    val files = writeDataFiles(df, start)
    val written = files.map(_.rowCount).sum
    commitSnapshot(
      newSnapshot("append", dataFiles ++ files, deleteFiles,
        Map("added-data-files" -> files.size.toString,
          "added-records" -> written.toString)),
      m => if (m.nextRowId >= 0) m.copy(nextRowId = start + written) else m)
  }

  // ------------------------------------------------------------------- DML

  /** DELETE FROM … WHERE cond (M4): merge-on-read writes a position-delete
    * file; copy-on-write rewrites affected data files. */
  def delete(cond: Column): LakeTable =
    if (isMorDelete) morDelete(cond, None) else cowRewrite(cond, None)

  /** UPDATE … SET assignments WHERE cond (M5): MoR emits one commit with a
    * position-delete file + appended rewritten rows (J3); CoW rewrites the
    * affected files in place. */
  def update(assignments: Map[String, Column], cond: Column): LakeTable =
    if (isMorUpdate) morDelete(cond, Some(assignments))
    else cowRewrite(cond, Some(assignments))

  private def applyAssignments(df: DataFrame, as: Map[String, Column]): DataFrame =
    df.select(schema.fields.map { f =>
      as.get(f.name).map(_.cast(f.dataType).as(f.name)).getOrElse(col(f.name))
    }: _*)

  private def morDelete(cond: Column, upd: Option[Map[String, Column]]): LakeTable = {
    val live = readWithCoords()
    val matched = live.filter(cond).cache()
    try {
      val coords = matched.select(col(FileCol).as("file_path"), col(PosCol).as("pos"))
      val delDir = location.resolve("deletes")
      Files.createDirectories(delDir)
      val delPath = delDir.resolve(UUID.randomUUID().toString)
      // delete sets are small relative to data; one file per commit is the
      // Iceberg-writer default shape. (Partitioned delete-file fanout would
      // slot in here for very large predicates.)
      coords.coalesce(1).write.parquet(delPath.toString)
      val delFiles = listParquetFiles(delPath)
      val nDeleted = matched.count()
      if (nDeleted == 0) return this
      val delMeta = delFiles.map(p =>
        DeleteFileMeta(p.toString, "position", nDeleted))
      upd match {
        case None =>
          commitSnapshot(newSnapshot("delete", dataFiles, deleteFiles ++ delMeta,
            Map("deleted-records" -> nDeleted.toString)))
        case Some(as) =>
          val start = if (meta.nextRowId >= 0) meta.nextRowId else meta.computedNextRowId
          val rewritten = applyAssignments(matched, as)
          val newData = writeDataFiles(rewritten, start)
          val written = newData.map(_.rowCount).sum
          commitSnapshot(
            newSnapshot("update", dataFiles ++ newData, deleteFiles ++ delMeta,
              Map("updated-records" -> nDeleted.toString)),
            m => if (m.nextRowId >= 0) m.copy(nextRowId = start + written) else m)
      }
    } finally matched.unpersist()
  }

  /** Copy-on-write delete/update: rewrite only the files containing
    * matched rows; untouched files are carried over. */
  private def cowRewrite(cond: Column, upd: Option[Map[String, Column]]): LakeTable = {
    val live = readWithCoords().cache()
    try {
      val affectedUris = live.filter(cond).select(FileCol).distinct()
        .collect().map(_.getString(0))
      if (affectedUris.isEmpty) return this
      val affected = affectedUris.map(stripScheme).toSet
      val keep = dataFiles.filterNot(f => affected.contains(f.path))
      val affectedRows = live.filter(col(FileCol).isin(affectedUris.toSeq: _*))
      val dataCols = schema.fieldNames.map(col)
      val survivors = affectedRows.filter(!cond).select(dataCols: _*)
      val replacement = upd match {
        case None => survivors
        case Some(as) =>
          survivors.unionByName(applyAssignments(affectedRows.filter(cond), as))
      }
      val start = if (meta.nextRowId >= 0) meta.nextRowId else meta.computedNextRowId
      val newData = writeDataFiles(replacement, start)
      val written = newData.map(_.rowCount).sum
      // drop position-delete rows pointing at removed files lazily: the
      // paths no longer exist in the scan, so stale entries are inert;
      // compaction rewrites delete files wholesale.
      commitSnapshot(
        newSnapshot(if (upd.isEmpty) "delete" else "update",
          keep ++ newData, deleteFiles,
          Map("rewritten-files" -> affected.size.toString)),
        m => if (m.nextRowId >= 0) m.copy(nextRowId = start + written) else m)
    } finally live.unpersist()
  }

  /** Equality deletes (J2, v2 spec completeness): rows matching any tuple
    * of `values` over `cols` are dropped at scan time via anti-join. */
  def addEqualityDeletes(values: DataFrame, cols: Seq[String]): LakeTable = {
    val delDir = location.resolve("deletes")
    Files.createDirectories(delDir)
    val delPath = delDir.resolve(UUID.randomUUID().toString)
    val distinctVals = values.select(cols.map(col): _*).distinct()
    distinctVals.coalesce(1).write.parquet(delPath.toString)
    val n = spark.read.parquet(delPath.toString).count()
    val delMeta = listParquetFiles(delPath)
      .map(p => DeleteFileMeta(p.toString, "equality", n, cols))
    commitSnapshot(newSnapshot("delete", dataFiles, deleteFiles ++ delMeta,
      Map("equality-delete-records" -> n.toString)))
  }

  // -------------------------------------------------------------- metadata

  /** ALTER TABLE … SET TBLPROPERTIES (generic); format-version changes go
    * through Procedures.upgradeFormatVersion. */
  def setProperties(kv: Map[String, String]): LakeTable = {
    val m = meta.copy(props = meta.props ++ kv)
    Meta.commit(location, m)
    new LakeTable(spark, location, m, clock)
  }

  private[lake] def withMeta(m: TableMetadata): LakeTable = {
    Meta.commit(location, m)
    new LakeTable(spark, location, m, clock)
  }

  /** DESCRIBE (M6): (col_name, data_type) rows. */
  def describe(): DataFrame = {
    import spark.implicits._
    schema.fields.toSeq
      .map(f => (f.name, f.dataType.sql.toLowerCase))
      .toDF("col_name", "data_type")
  }
}

object LakeTable {
  private[lake] val FileCol = "__fp"
  private[lake] val PosCol = "__pos"
  private[lake] val PartPrefix = "__p_"

  private[lake] val DeleteSchema = StructType(Seq(
    StructField("file_path", StringType), StructField("pos", LongType)))

  private[lake] def stripScheme(p: String): String =
    if (p.startsWith("file:"))
      java.nio.file.Paths.get(java.net.URI.create(p)).toString
    else p

  private[lake] def listParquetFiles(dir: Path): Seq[Path] = {
    if (!Files.exists(dir)) return Nil
    val s = Files.walk(dir)
    try s.iterator().asScala
      .filter(p => Files.isRegularFile(p) && p.getFileName.toString.endsWith(".parquet"))
      .toList
    finally s.close()
  }

  private[lake] def partitionValuesFromPath(p: Path): Map[String, String] = {
    (0 until p.getNameCount).map(p.getName(_).toString)
      .filter(_.startsWith(PartPrefix))
      .flatMap { seg =>
        val i = seg.indexOf('=')
        if (i < 0) None
        else Some(seg.substring(PartPrefix.length, i) ->
          URLDecoder.decode(seg.substring(i + 1), "UTF-8"))
      }.toMap
  }
}
