package graft.lake

import java.io.IOException
import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.{ParquetFileWriter, ParquetWriter}
import org.apache.parquet.hadoop.api.WriteSupport
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.execution.datasources.parquet.ParquetWriteSupport
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Native row-level DML — `DELETE FROM` / `UPDATE` / `MERGE INTO` typed
  * against the registered DSv2 catalog (`SupportsRowLevelOperations` /
  * `SupportsDelta`; VERDICT r5 next #8, reference statement surface
  * `internal/create_demo_table.py:130-133`).
  *
  * Catalyst rewrites the statement into a WriteDelta plan: the table is
  * scanned through [[LakeRowLevelOperation.newScanBuilder]] (the ordinary
  * MoR-aware scan), each affected row is projected down to its
  * `(_file_path, _pos)` rowId — the physical coordinates the scan exposes
  * as DSv2 metadata columns — and streamed to per-partition
  * [[LakeDeltaWriter]]s:
  *
  *  - DELETEd coordinates land in a position-delete parquet file;
  *  - UPDATEd rows land in a rewrite data file (v3: with their `_row_id`
  *    carried through the scan's metadata projection, preserving lineage
  *    exactly like the dispatcher's MoR update);
  *  - MERGE-inserted rows land in a plain data file whose v3 row-id
  *    range is minted at commit time.
  *
  * Nothing data-scale touches the driver: coordinates and rows flow
  * executor→parquet directly (Spark's own `ParquetWriteSupport` encodes
  * `InternalRow`s, so files are byte-compatible with session writes),
  * and the driver-side [[LakeDeltaBatchWrite.commit]] lands ONE MoR
  * snapshot from a handle reloaded at commit time — CAS-ing against the
  * metadata version current then, the same optimistic-concurrency rule
  * as every other commit path. The LakeSql dispatcher remains the
  * fallback surface for all three statements (and the only one for CoW
  * write modes — the native path is always merge-on-read).
  */
private[lake] class LakeRowLevelOperation(
    t: LakeTable, cmd: RowLevelOperation.Command) extends SupportsDelta {

  private def v3 = t.meta.formatVersion >= 3

  override def command(): RowLevelOperation.Command = cmd

  /** The operation reads through the table's ordinary MoR-aware scan —
    * Spark asks it for the rowId/metadata columns by name. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeV2Table(t).newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder = {
    val rowSchema = info.schema()
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite =
          new LakeDeltaBatchWrite(t, cmd, rowSchema)
      }
    }
  }

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(LakeV2Table.FilePathMeta),
      Expressions.column(LakeV2Table.PosMeta))

  /** v3 updates/merges carry each matched row's `_row_id` through the
    * plan so rewritten rows keep their lineage ids. */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (cmd != RowLevelOperation.Command.DELETE && v3)
      Array(Expressions.column(LakeTable.RowIdCol))
    else Array.empty
}

private[lake] object LakeDeltaWriter {
  /** Physical schema of a position-delete file — must read back through
    * LakeTable.DeleteSchema (file_path STRING, pos BIGINT). */
  val DeleteFileType: MessageType = Types.buildMessage()
    .required(PrimitiveType.PrimitiveTypeName.BINARY)
    .as(LogicalTypeAnnotation.stringType()).named("file_path")
    .required(PrimitiveType.PrimitiveTypeName.INT64).named("pos")
    .named("position_delete")

  private class RowBuilder(path: org.apache.hadoop.fs.Path)
      extends ParquetWriter.Builder[InternalRow, RowBuilder](path) {
    override def self(): RowBuilder = this
    override def getWriteSupport(c: Configuration): WriteSupport[InternalRow] =
      new ParquetWriteSupport().asInstanceOf[WriteSupport[InternalRow]]
  }

  /** Executor-side `InternalRow` parquet writer, byte-compatible with the
    * session's own writes (Spark's ParquetWriteSupport + the mirrored
    * session conf). Shared by the delta (MoR) and group (CoW) writers. */
  def openRowWriter(parquetConf: Map[String, String], path: String,
      schema: StructType): ParquetWriter[InternalRow] = {
    val c = new Configuration()
    ParquetWriteSupport.setSchema(schema, c)
    // the conf keys ParquetFileFormat.prepareWrite sets before handing
    // this WriteSupport to tasks — mirrored from the session so the
    // files are indistinguishable from driver-written ones
    parquetConf.foreach { case (k, v) => c.set(k, v) }
    new RowBuilder(new org.apache.hadoop.fs.Path(path))
      .withConf(c)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
      .build()
  }

  /** Effective session values for every conf key ParquetWriteSupport and
    * its schema converter read at init (disassembled from 4.1.2) —
    * EXCEPT the rebase modes: session default EXCEPTION asks the *write
    * path* to fail on pre-Gregorian values, which a fresh executor-side
    * Configuration can't adjudicate; CORRECTED writes proleptic-Gregorian
    * as-is, matching modern session writes. */
  def mirroredParquetConf(): Map[String, String] = {
    import org.apache.spark.sql.internal.SQLConf
    val sqlConf = SQLConf.get
    val entries = Seq(
      SQLConf.PARQUET_WRITE_LEGACY_FORMAT,
      SQLConf.PARQUET_OUTPUT_TIMESTAMP_TYPE,
      SQLConf.PARQUET_FIELD_ID_WRITE_ENABLED,
      SQLConf.PARQUET_ANNOTATE_VARIANT_LOGICAL_TYPE,
      SQLConf.SESSION_LOCAL_TIMEZONE)
    entries.map(e =>
      e.key -> sqlConf.getConfString(e.key, e.defaultValueString)).toMap +
      (SQLConf.PARQUET_REBASE_MODE_IN_WRITE.key -> "CORRECTED") +
      (SQLConf.PARQUET_INT96_REBASE_MODE_IN_WRITE.key -> "CORRECTED")
  }
}

/** Serializable writer config: everything an executor needs to produce
  * files byte-compatible with the session's own parquet writes. */
private[lake] case class LakeDeltaWriteConf(
    deletesDir: String,
    dataDir: String,
    runId: String,
    /** JSON of the row schema Spark feeds to update()/insert(). */
    rowSchemaJson: String,
    /** Whether update rows carry a `_row_id` metadata value to persist. */
    withRowIds: Boolean,
    /** Effective session values for every conf key ParquetWriteSupport
      * and its schema converter read at init, mirrored so executor-
      * written files match driver-written ones. */
    parquetConf: Map[String, String])

private[lake] case class LakeDeltaWriterFactory(conf: LakeDeltaWriteConf)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new LakeDeltaWriter(conf, s"${conf.runId}-$partitionId-$taskId")
}

private[lake] case class LakeDeltaCommit(
    deletePath: String, deleteRows: Long,
    rowIdDataPath: String, rowIdDataRows: Long,
    plainDataPath: String, plainDataRows: Long) extends WriterCommitMessage

/** Executor-side delta writer: buffers nothing — deleted coordinates,
  * rewritten rows, and inserted rows stream straight into (at most)
  * three parquet files. Writers open lazily, so a task that matches
  * nothing writes nothing. */
private[lake] class LakeDeltaWriter(conf: LakeDeltaWriteConf, suffix: String)
    extends DeltaWriter[InternalRow] {

  private val rowSchema =
    DataType.fromJson(conf.rowSchemaJson).asInstanceOf[StructType]

  // --- position-delete file (simple fixed schema: parquet Group API)
  private var delWriter: ParquetWriter[org.apache.parquet.example.data.Group] = null
  private val delFactory = new SimpleGroupFactory(LakeDeltaWriter.DeleteFileType)
  private val delPath = s"${conf.deletesDir}/$suffix.parquet"
  private var delRows = 0L

  // --- data files (arbitrary Spark schema: Spark's own WriteSupport)
  private var updWriter: ParquetWriter[InternalRow] = null
  private val updPath = s"${conf.dataDir}/$suffix-u.parquet"
  private var updRows = 0L
  private var insWriter: ParquetWriter[InternalRow] = null
  private val insPath = s"${conf.dataDir}/$suffix-i.parquet"
  private var insRows = 0L
  private val joined = new JoinedRow()

  private def openRowWriter(path: String, schema: StructType): ParquetWriter[InternalRow] =
    LakeDeltaWriter.openRowWriter(conf.parquetConf, path, schema)

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (delWriter == null) {
      val c = new Configuration()
      c.set(org.apache.parquet.hadoop.example.GroupWriteSupport.PARQUET_EXAMPLE_SCHEMA,
        LakeDeltaWriter.DeleteFileType.toString)
      delWriter = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(delPath))
        .withConf(c)
        .withType(LakeDeltaWriter.DeleteFileType)
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .build()
    }
    val g = delFactory.newGroup()
    // copy out of the reused row immediately
    g.append("file_path", id.getUTF8String(0).toString)
    g.append("pos", id.getLong(1))
    delWriter.write(g)
    delRows += 1L
  }

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(metadata, id) // the old version's coordinates
    if (conf.withRowIds) {
      if (updWriter == null)
        updWriter = openRowWriter(updPath,
          StructType(rowSchema.fields :+ StructField(LakeTable.RowIdCol, LongType)))
      joined.apply(row,
        new GenericInternalRow(Array[Any](metadata.getLong(0))))
      updWriter.write(joined)
    } else {
      if (updWriter == null) updWriter = openRowWriter(updPath, rowSchema)
      updWriter.write(row)
    }
    updRows += 1L
  }

  override def insert(row: InternalRow): Unit = {
    if (insWriter == null) insWriter = openRowWriter(insPath, rowSchema)
    insWriter.write(row)
    insRows += 1L
  }

  override def commit(): WriterCommitMessage = {
    if (delWriter != null) delWriter.close()
    if (updWriter != null) updWriter.close()
    if (insWriter != null) insWriter.close()
    LakeDeltaCommit(
      if (delRows > 0) delPath else null, delRows,
      if (updRows > 0) updPath else null, updRows,
      if (insRows > 0) insPath else null, insRows)
  }

  override def abort(): Unit = {
    Seq(delWriter, updWriter, insWriter).foreach(w => if (w != null) w.close())
    Seq(delPath, updPath, insPath).foreach(p =>
      Files.deleteIfExists(Paths.get(p)))
  }

  override def close(): Unit = ()
}

/** Driver-side commit: the delta files become one MoR snapshot. The
  * commit goes through the ANALYSIS-TIME handle `t`, never a reloaded
  * one: the delta coordinates were computed against `t`'s file set, so
  * if any commit landed since (a compaction rewriting the referenced
  * files, another DML), Meta.commit's expectedVersion CAS must reject
  * with CommitConflictException — reloading here would CAS against the
  * NEW version and let a position-delete file referencing rewritten
  * (dead) paths commit as a silent no-op, losing the delete. Same
  * stale-handle contract the dispatcher DML path enforces
  * (ConcurrencySpec: state-dependent DML never lands silently). */
private[lake] class LakeDeltaBatchWrite(
    t: LakeTable, cmd: RowLevelOperation.Command, rowSchema: StructType)
    extends DeltaBatchWrite {

  Files.createDirectories(t.location.resolve("deletes"))
  private val dataDir = t.location.resolve("data").resolve(UUID.randomUUID().toString)
  Files.createDirectories(dataDir)

  private val withRowIds =
    cmd != RowLevelOperation.Command.DELETE && t.meta.formatVersion >= 3

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    LakeDeltaWriterFactory(LakeDeltaWriteConf(
      deletesDir = t.location.resolve("deletes").toString,
      dataDir = dataDir.toString,
      runId = UUID.randomUUID().toString,
      rowSchemaJson = rowSchema.json,
      withRowIds = withRowIds,
      parquetConf = LakeDeltaWriter.mirroredParquetConf()))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val cs = messages.collect { case c: LakeDeltaCommit => c }
    val nDel = cs.map(_.deleteRows).sum
    val nUpd = cs.map(_.rowIdDataRows).sum
    val nIns = cs.map(_.plainDataRows).sum
    if (nDel + nUpd + nIns == 0) { cleanupIfEmpty(); return }

    val cur = t // analysis-time handle: see class Scaladoc
    val seq = cur.meta.lastSequenceNumber + 1
    val hadoopConf = SparkSession.active.sessionState.newHadoopConf()

    val delMetas = cs.collect {
      case c if c.deletePath != null =>
        DeleteFileMeta(c.deletePath, "position", c.deleteRows,
          dataSequenceNumber = seq)
    }.toSeq

    def dataMeta(path: String, rows: Long, firstRowId: Long,
        explicit: Boolean): DataFileMeta =
      DataFileMeta(
        path = path,
        // delta-written files record real footer stats (skipping keeps
        // working over updated regions) but no partition values — the
        // writers aren't partition-split — so partition pruning keeps
        // them conservatively (absent ⇒ file always survives)
        partitionValues = Map.empty,
        rowCount = rows,
        sizeBytes = Files.size(Paths.get(path)),
        stats = StatsPruning.collectStats(hadoopConf, Paths.get(path), cur.schema),
        firstRowId = firstRowId,
        explicitRowIds = explicit,
        dataSequenceNumber = seq)

    // v3 rewrites carry their lineage ids in an explicit column
    val updMetas = cs.collect {
      case c if c.rowIdDataPath != null =>
        dataMeta(c.rowIdDataPath, c.rowIdDataRows,
          firstRowId = if (withRowIds) -1L else 0L, explicit = withRowIds)
    }.toSeq
    // plain files (v2 rewrites, merge inserts) mint fresh disjoint ranges
    val plainFiles = cs.collect {
      case c if c.plainDataPath != null => (c.plainDataPath, c.plainDataRows)
    }.toSeq
    val start =
      if (cur.meta.nextRowId >= 0) cur.meta.nextRowId
      else cur.meta.computedNextRowId
    var rowId = start
    val plainMetas = plainFiles.map { case (p, n) =>
      val m = dataMeta(p, n, rowId, explicit = false); rowId += n; m
    }
    // v2 update files also need minted ranges (v3 ones carry explicit
    // ids); minting order: plain files first, then v2 update files
    val updFinal =
      if (withRowIds) updMetas
      else updMetas.map { m =>
        val withId = m.copy(firstRowId = rowId); rowId += m.rowCount; withId
      }
    val minted = rowId - start

    val (opName, summary) = cmd match {
      case RowLevelOperation.Command.DELETE =>
        ("delete", Map("deleted-records" -> nDel.toString))
      case RowLevelOperation.Command.UPDATE =>
        ("update", Map("updated-records" -> (nUpd + nIns).toString))
      case _ =>
        ("merge", Map("matched-records" -> nDel.toString,
          "inserted-records" -> nIns.toString))
    }
    cur.commitSnapshot(
      cur.newSnapshot(opName, cur.dataFiles ++ updFinal ++ plainMetas,
        cur.deleteFiles ++ delMetas, summary),
      m => if (m.nextRowId >= 0 && minted > 0) m.copy(nextRowId = start + minted)
        else m)
    cleanupIfEmpty()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case c: LakeDeltaCommit =>
        Seq(c.deletePath, c.rowIdDataPath, c.plainDataPath).foreach(p =>
          if (p != null) Files.deleteIfExists(Paths.get(p)))
      case _ => ()
    }
    cleanupIfEmpty()
  }

  /** Drop the per-write data dir when no task wrote a data file. */
  private def cleanupIfEmpty(): Unit =
    if (Files.isDirectory(dataDir)) {
      val s = Files.list(dataDir)
      val empty = try !s.iterator().hasNext finally s.close()
      if (empty) Files.deleteIfExists(dataDir)
    }
}

// --------------------------------------------------------------------------
// Copy-on-write (group-based) row-level DML — VERDICT r6 next #2.
// --------------------------------------------------------------------------

/** Native `DELETE`/`UPDATE`/`MERGE` for `write.*.mode=copy-on-write`
  * tables: a plain (non-delta) [[RowLevelOperation]], so Catalyst's
  * RewriteDeleteFromTable / RewriteUpdateTable / RewriteMergeIntoTable
  * produce a group-based `ReplaceData` plan — affected GROUPS (files) are
  * rewritten whole, and the commit swaps them for the written files. No
  * delete file is ever minted, which is the CoW contract: strict v2
  * readers (the reference's motivating reader class, README.md:5-7) must
  * be able to scan the result.
  *
  * Group scope = the data files surviving the statement condition's
  * partition + footer-stats pruning. The scope predicate is computed ONCE
  * — by [[NativeReadRule]]'s ReplaceData splice, which also builds the
  * scan over exactly the files it admits — and stored here for the
  * commit, so scan and commit partition the SAME file set by the SAME
  * predicate object: they can never disagree, which is what makes the
  * swap lossless (a file the scan read but the commit kept would
  * duplicate its rows; the shared predicate makes that impossible by
  * construction).
  *
  * The scan itself is the NativeReadRule splice of
  * [[LakeTable.readWithCoords]] — group-based plans head for
  * `BatchScanExec`, which the engine's V1Scan bridge cannot serve
  * ("Batch scan are not supported"), so native CoW DML REQUIRES
  * [[LakeExtensions]] to be installed (every session builder in the repo
  * does; without it the statement fails loudly at planning, never
  * corrupts).
  *
  * Scale notes: scope precision comes from partition + stats pruning; a
  * runtime group-filter subquery (SupportsRuntimeV2Filtering, Iceberg's
  * trick to narrow scope to files that CONTAIN matches) needs a native
  * DSv2 Batch scan — so a condition the stats can't bound rewrites every
  * scoped file. That is correct-but-conservative, the same posture as
  * partition pruning over delta-written files. v3 lineage: every
  * surviving/updated row carries its `_row_id` through the plan
  * (requiredMetadataAttributes) into an explicit-row-id file;
  * merge-inserted rows (null metadata) land in a separate file and mint
  * fresh ids at commit. */
private[lake] class LakeCowRowLevelOperation(
    t: LakeTable, cmd: RowLevelOperation.Command) extends RowLevelOperation {

  /** The group-scope predicate, set by NativeReadRule's splice during
    * optimization (single-threaded), read at commit. Default admits
    * everything — unreachable in practice, because without the splice the
    * scan itself fails at planning. */
  @volatile private var scopePred: DataFileMeta => Boolean = _ => true

  private[lake] def table: LakeTable = t
  private[lake] def setScope(p: DataFileMeta => Boolean): Unit = scopePred = p

  override def command(): RowLevelOperation.Command = cmd

  /** Only planned when LakeExtensions is absent — then the V1Scan bridge
    * reaches BatchScanExec and fails loudly (see class Scaladoc). The
    * real scan is the NativeReadRule splice. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeV2Table(t).newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val rowSchema = info.schema()
    new WriteBuilder {
      override def build(): Write = new Write {
        override def toBatch: BatchWrite =
          new LakeCowBatchWrite(t, cmd, rowSchema, () => scopePred)
      }
    }
  }

  /** v3: every written-back row must keep its lineage id (CoW copies
    * preserve `_row_id` — same rule as the dispatcher's cowRewrite).
    * v2 still requests `_file_path`: a group-based write with NO
    * projected metadata takes Spark's plain DataWritingSparkTask, which
    * does not apply the row projection — the writer would receive the
    * raw query row with the prepended `__row_operation` column and write
    * garbage (found live: 5-col CoW DELETE, AIOOBE in writeFields).
    * Requesting any metadata attribute forces
    * DataAndMetadataWritingSparkTask, whose row projection strips the
    * operation column (the same contract Iceberg's CoW relies on by
    * always projecting `_file`). */
  override def requiredMetadataAttributes(): Array[NamedReference] =
    if (t.meta.formatVersion >= 3) Array(Expressions.column(LakeTable.RowIdCol))
    else Array(Expressions.column(LakeV2Table.FilePathMeta))
}

private[lake] case class LakeCowCommit(
    preservedPath: String, preservedRows: Long,
    mintedPath: String, mintedRows: Long) extends WriterCommitMessage

private[lake] case class LakeCowWriterFactory(conf: LakeDeltaWriteConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new LakeCowWriter(conf, s"${conf.runId}-$partitionId-$taskId")
}

/** Executor-side CoW rewrite writer: streams rows into at most two
  * parquet files per task — `-p` (rows whose `_row_id` metadata is
  * present: survivors + updates, persisted as an explicit lineage column)
  * and `-m` (rows with no lineage: v2 tables, merge inserts; commit mints
  * their implicit id ranges). `conf.deletesDir` is unused here — a CoW
  * write never mints a delete file, by construction. */
private[lake] class LakeCowWriter(conf: LakeDeltaWriteConf, suffix: String)
    extends DataWriter[InternalRow] {

  private val rowSchema =
    DataType.fromJson(conf.rowSchemaJson).asInstanceOf[StructType]

  private var presWriter: ParquetWriter[InternalRow] = null
  private val presPath = s"${conf.dataDir}/$suffix-p.parquet"
  private var presRows = 0L
  private var mintWriter: ParquetWriter[InternalRow] = null
  private val mintPath = s"${conf.dataDir}/$suffix-m.parquet"
  private var mintRows = 0L
  private val joined = new JoinedRow()

  override def write(row: InternalRow): Unit = {
    if (mintWriter == null)
      mintWriter = LakeDeltaWriter.openRowWriter(conf.parquetConf, mintPath, rowSchema)
    mintWriter.write(row)
    mintRows += 1L
  }

  /** Two-arg form: Spark's DataAndMetadataWritingSparkTask feeds
    * (metadataRow, dataRow) when the plan carries projected metadata —
    * here the single `_row_id` attribute. Null metadata = a row with no
    * target provenance (merge insert) → minted file. */
  override def write(metadata: InternalRow, row: InternalRow): Unit =
    if (!conf.withRowIds || metadata == null || metadata.isNullAt(0)) write(row)
    else {
      if (presWriter == null)
        presWriter = LakeDeltaWriter.openRowWriter(conf.parquetConf, presPath,
          StructType(rowSchema.fields :+ StructField(LakeTable.RowIdCol, LongType)))
      joined.apply(row, new GenericInternalRow(Array[Any](metadata.getLong(0))))
      presWriter.write(joined)
      presRows += 1L
    }

  override def commit(): WriterCommitMessage = {
    if (presWriter != null) presWriter.close()
    if (mintWriter != null) mintWriter.close()
    LakeCowCommit(
      if (presRows > 0) presPath else null, presRows,
      if (mintRows > 0) mintPath else null, mintRows)
  }

  override def abort(): Unit = {
    Seq(presWriter, mintWriter).foreach(w => if (w != null) w.close())
    Seq(presPath, mintPath).foreach(p => Files.deleteIfExists(Paths.get(p)))
  }

  override def close(): Unit = ()
}

/** Driver-side CoW commit: swap the scoped files for the written ones in
  * ONE snapshot, delete files untouched (none are minted, existing ones
  * keep applying to the untouched files). Commits through the
  * ANALYSIS-TIME handle, same contract (and same Scaladoc rationale) as
  * [[LakeDeltaBatchWrite]]: the rewrite was computed against `t`'s file
  * set, so any interleaved commit must surface CommitConflictException
  * rather than silently basing the swap on rewritten state. */
private[lake] class LakeCowBatchWrite(
    t: LakeTable, cmd: RowLevelOperation.Command, rowSchema: StructType,
    scopePred: () => DataFileMeta => Boolean)
    extends BatchWrite {

  private val dataDir = t.location.resolve("data").resolve(UUID.randomUUID().toString)
  Files.createDirectories(dataDir)

  private val withRowIds = t.meta.formatVersion >= 3

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    LakeCowWriterFactory(LakeDeltaWriteConf(
      deletesDir = "", // never used: CoW writes mint no delete files
      dataDir = dataDir.toString,
      runId = UUID.randomUUID().toString,
      rowSchemaJson = rowSchema.json,
      withRowIds = withRowIds,
      parquetConf = LakeDeltaWriter.mirroredParquetConf()))

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val cs = messages.collect { case c: LakeCowCommit => c }
    val cur = t // analysis-time handle: see class Scaladoc
    // the EXACT predicate the spliced scan selected its files with
    val (scope, keep) = cur.dataFiles.partition(scopePred())
    val nPres = cs.map(_.preservedRows).sum
    val nMint = cs.map(_.mintedRows).sum
    val written = nPres + nMint

    def dropWritten(): Unit = {
      cs.foreach { c =>
        Seq(c.preservedPath, c.mintedPath).foreach(p =>
          if (p != null) Files.deleteIfExists(Paths.get(p)))
      }
      cleanupIfEmpty()
    }
    // Statically-empty scope with nothing written: nothing to do. (A
    // merge can write inserts even with an empty scope, so `written`
    // matters too.)
    if (scope.isEmpty && written == 0) { dropWritten(); return }
    // DELETE that matched no rows rewrites the scope verbatim — output
    // row count equals the scope's live rows exactly when nothing was
    // deleted. Only provable when no delete files exist (rowCount sums
    // are then exact live counts); then skip the no-op commit and drop
    // the redundant rewrite, matching the delta path's
    // nothing-matched-commits-nothing behavior.
    if (cmd == RowLevelOperation.Command.DELETE && cur.deleteFiles.isEmpty &&
        written == scope.map(_.rowCount).sum) { dropWritten(); return }

    val seq = cur.meta.lastSequenceNumber + 1
    val hadoopConf = SparkSession.active.sessionState.newHadoopConf()
    def dataMeta(path: String, rows: Long, firstRowId: Long,
        explicit: Boolean): DataFileMeta =
      DataFileMeta(
        path = path,
        partitionValues = Map.empty, // same gap as the delta writers
        rowCount = rows,
        sizeBytes = Files.size(Paths.get(path)),
        stats = StatsPruning.collectStats(hadoopConf, Paths.get(path), cur.schema),
        firstRowId = firstRowId,
        explicitRowIds = explicit,
        dataSequenceNumber = seq)

    val presMetas = cs.collect {
      case c if c.preservedPath != null =>
        dataMeta(c.preservedPath, c.preservedRows, firstRowId = -1L, explicit = true)
    }.toSeq
    val start =
      if (cur.meta.nextRowId >= 0) cur.meta.nextRowId
      else cur.meta.computedNextRowId
    var rowId = start
    val mintMetas = cs.collect {
      case c if c.mintedPath != null => (c.mintedPath, c.mintedRows)
    }.toSeq.map { case (p, n) =>
      val m = dataMeta(p, n, rowId, explicit = false); rowId += n; m
    }
    val minted = rowId - start

    val (opName, summary) = cmd match {
      case RowLevelOperation.Command.DELETE =>
        val deleted =
          if (cur.deleteFiles.isEmpty) scope.map(_.rowCount).sum - written
          else -1L // live counts unknowable under MoR deletes
        ("delete", Map("rewritten-files" -> scope.size.toString) ++
          (if (deleted >= 0) Map("deleted-records" -> deleted.toString) else Map.empty))
      case RowLevelOperation.Command.UPDATE =>
        ("update", Map("rewritten-files" -> scope.size.toString,
          "written-records" -> written.toString))
      case _ =>
        // minted rows are specifically merge-inserts only on v3 (v2
        // routes every row to the minted file — no lineage to preserve)
        ("merge", Map("rewritten-files" -> scope.size.toString) ++
          (if (withRowIds) Map("inserted-records" -> nMint.toString)
           else Map("written-records" -> written.toString)))
    }
    cur.commitSnapshot(
      cur.newSnapshot(opName, keep ++ presMetas ++ mintMetas,
        cur.deleteFiles, summary),
      m => if (m.nextRowId >= 0 && minted > 0) m.copy(nextRowId = start + minted)
        else m)
    cleanupIfEmpty()
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    messages.foreach {
      case c: LakeCowCommit =>
        Seq(c.preservedPath, c.mintedPath).foreach(p =>
          if (p != null) Files.deleteIfExists(Paths.get(p)))
      case _ => ()
    }
    cleanupIfEmpty()
  }

  private def cleanupIfEmpty(): Unit =
    if (Files.isDirectory(dataDir)) {
      val s = Files.list(dataDir)
      val empty = try !s.iterator().hasNext finally s.close()
      if (empty) Files.deleteIfExists(dataDir)
    }
}
