package graft.lake

import java.io.IOException
import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, PrimitiveType, Types}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Native `DELETE FROM lake.db.t WHERE …` through Spark SQL
  * (SupportsRowLevelOperations / SupportsDelta — VERDICT r5 next #8,
  * reference statement surface `internal/create_demo_table.py:130`).
  *
  * Catalyst's RewriteDeleteFromTable rewrites the statement into a
  * WriteDelta plan: it scans the table through [[LakeDeleteOperation
  * .newScanBuilder]] with the delete condition pushed/filtered, projects
  * each matched row down to the [[rowId]] columns — the `(_file_path,
  * _pos)` physical coordinates the MoR scan already exposes as DSv2
  * metadata columns — and feeds them to per-partition [[LakeDeltaWriter]]s.
  * Each writer streams its coordinates straight into a position-delete
  * parquet file under `deletes/` (parquet-hadoop writer, no
  * driver-side collection — the delta volume stays distributed exactly
  * like the dispatcher's writeDeleteFiles path), and the driver-side
  * [[LakeDeltaBatchWrite.commit]] lands ONE MoR "delete" snapshot from a
  * handle reloaded at commit time, so it CAS-es against the metadata
  * version current then (same optimistic-concurrency rule as every other
  * commit path).
  *
  * DELETE only: UPDATE/MERGE keep using the LakeSql dispatcher, which
  * remains the fallback surface for all three statements.
  */
private[lake] class LakeDeleteOperation(t: LakeTable) extends SupportsDelta {

  override def command(): RowLevelOperation.Command =
    RowLevelOperation.Command.DELETE

  /** The operation reads through the table's ordinary MoR-aware scan —
    * Spark asks it for the rowId metadata columns by name. */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new LakeV2Table(t).newScanBuilder(options)

  override def newWriteBuilder(info: LogicalWriteInfo): DeltaWriteBuilder =
    new DeltaWriteBuilder {
      override def build(): DeltaWrite = new DeltaWrite {
        override def toBatch: DeltaBatchWrite = new LakeDeltaBatchWrite(t)
      }
    }

  override def rowId(): Array[NamedReference] =
    Array(Expressions.column(LakeV2Table.FilePathMeta),
      Expressions.column(LakeV2Table.PosMeta))
}

private[lake] object LakeDeltaWriter {
  /** Physical schema of a position-delete file — must read back through
    * LakeTable.DeleteSchema (file_path STRING, pos BIGINT). */
  val DeleteFileType: MessageType = Types.buildMessage()
    .required(PrimitiveType.PrimitiveTypeName.BINARY)
    .as(LogicalTypeAnnotation.stringType()).named("file_path")
    .required(PrimitiveType.PrimitiveTypeName.INT64).named("pos")
    .named("position_delete")
}

/** Serializable per-task factory: all a writer needs is the target
  * directory; files are uniquely named per (partition, task) attempt. */
private[lake] case class LakeDeltaWriterFactory(deletesDir: String, runId: String)
    extends DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DeltaWriter[InternalRow] =
    new LakeDeltaWriter(
      s"$deletesDir/$runId-$partitionId-$taskId.parquet")
}

private[lake] case class LakeDeltaCommit(path: String, rows: Long)
    extends WriterCommitMessage

/** Executor-side delta writer: buffers nothing — each deleted row's
  * `(_file_path, _pos)` id lands directly in the task's parquet file.
  * The writer is opened lazily so tasks with no matches write no file. */
private[lake] class LakeDeltaWriter(path: String) extends DeltaWriter[InternalRow] {
  private var writer: org.apache.parquet.hadoop.ParquetWriter[
    org.apache.parquet.example.data.Group] = null
  private val factory = new SimpleGroupFactory(LakeDeltaWriter.DeleteFileType)
  private var rows = 0L

  override def delete(metadata: InternalRow, id: InternalRow): Unit = {
    if (writer == null) {
      val conf = new Configuration()
      conf.set(org.apache.parquet.hadoop.example.GroupWriteSupport.PARQUET_EXAMPLE_SCHEMA,
        LakeDeltaWriter.DeleteFileType.toString)
      writer = ExampleParquetWriter
        .builder(new org.apache.hadoop.fs.Path(path))
        .withConf(conf)
        .withType(LakeDeltaWriter.DeleteFileType)
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .build()
    }
    val g = factory.newGroup()
    // copy out of the reused row immediately
    g.append("file_path", id.getUTF8String(0).toString)
    g.append("pos", id.getLong(1))
    writer.write(g)
    rows += 1L
  }

  override def update(metadata: InternalRow, id: InternalRow, row: InternalRow): Unit =
    throw new IOException("delta UPDATE is not supported; use the LakeSql dispatcher")

  override def insert(row: InternalRow): Unit =
    throw new IOException("delta INSERT is not supported; use the LakeSql dispatcher")

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    LakeDeltaCommit(if (rows > 0) path else null, rows)
  }

  override def abort(): Unit = {
    if (writer != null) writer.close()
    Files.deleteIfExists(Paths.get(path))
  }

  override def close(): Unit = ()
}

/** Driver-side commit: the written delete files become one MoR "delete"
  * snapshot. The handle is reloaded here — at commit time — so the CAS
  * guard rejects the write if another commit landed since analysis. */
private[lake] class LakeDeltaBatchWrite(t: LakeTable) extends DeltaBatchWrite {

  Files.createDirectories(t.location.resolve("deletes"))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DeltaWriterFactory =
    LakeDeltaWriterFactory(
      t.location.resolve("deletes").toString, UUID.randomUUID().toString)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val written = messages.collect {
      case LakeDeltaCommit(p, n) if p != null && n > 0 => (p, n)
    }
    if (written.isEmpty) return // nothing matched: no empty snapshot
    val cur = t.reloaded()
    val seq = cur.meta.lastSequenceNumber + 1
    val metas = written.map { case (p, n) =>
      DeleteFileMeta(p, "position", n, dataSequenceNumber = seq)
    }.toSeq
    cur.commitSnapshot(cur.newSnapshot("delete", cur.dataFiles,
      cur.deleteFiles ++ metas,
      Map("deleted-records" -> written.map(_._2).sum.toString)))
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit =
    messages.foreach {
      case LakeDeltaCommit(p, _) if p != null =>
        Files.deleteIfExists(Paths.get(p))
      case _ => ()
    }
}
