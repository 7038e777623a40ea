package org.apache.spark.sql.graft

import java.nio.file.Paths

import org.apache.spark.sql.{DataFrame, SQLContext}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSession}
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

import graft.lake.{LakeCatalog, LakeTable}
import graft.streaming.StreamIngest

/** Structured Streaming SOURCE over a lake table: each micro-batch is an
  * incremental append scan between two snapshot ids, so a streaming query
  * tails the table's commit log — the continuous half of
  * [[graft.lake.LakeTable.readIncremental]] (reference analogue: the
  * demo pipeline's downstream consumers re-reading the upgraded table,
  * `demo.sh`; Iceberg's own Spark streaming read).
  *
  *   spark.readStream.format("graft-lake")
  *     .option("warehouse", wh).option("table", "db.t").load()
  *
  * Offsets ARE snapshot ids (monotone by construction — Meta.commit is a
  * total order), so exactly-once delivery falls out of the engine's
  * commit protocol: the checkpoint stores the last snapshot id whose
  * files were delivered, restart resumes after it, and a crash between
  * sink commit and checkpoint write replays one micro-batch (Spark's
  * standard at-least-once-into-idempotent-sink story). No per-file
  * bookkeeping: a micro-batch's file set is derived from the snapshot
  * log diff, metadata-scale work at any table size.
  *
  * Options: `warehouse` (path), `table` ("db.name"),
  * `startSnapshotId` (exclusive start — tail only commits after it;
  * default: from table start), `skipNonAppends` (skip snapshots that
  * mutate existing rows instead of failing; see readIncremental),
  * `branch` (tail that branch's head instead of main — the read half of
  * streaming write-audit-publish; the sink takes the same option to
  * land micro-batches on a branch), `maxSnapshotsPerTrigger` (advance at
  * most N commits per micro-batch — Iceberg's streaming rate limit; a
  * consumer resuming behind a long commit history catches up in
  * commit-sized batches instead of one table-sized batch),
  * `changelog` (true = CDC mode: micro-batches are row-level change
  * feeds with `_change_type`/`_change_ordinal`/`_commit_snapshot_id`
  * columns — the streaming twin of `create_changelog_view`).
  *
  * Rate-limit cursor: the last offset returned is latched IN MEMORY by
  * getOffset (so the running query's next poll advances, not re-offers)
  * and made durable under the stream's own `metadataPath` only from
  * getBatch — i.e. only after Spark has written the offset to its WAL —
  * so a crash can never leave the persisted cursor ahead of the
  * checkpoint's committed offset (which would withhold the uncommitted
  * tail from a restarted run until a fresh commit moved the head). If
  * the cursor file is lost, getBatch self-heals it from the
  * checkpoint's own range, and an interim poll that lands at or behind
  * the committed offset yields an EMPTY batch, never an inverted
  * incremental range.
  *
  * Lives in the `org.apache.spark.sql` namespace because the V1
  * streaming `Source` trait (the only streaming API that lets a source
  * return a full DataFrame plan — keeping the vectorized parquet scan,
  * codegen and column pruning of the batch path) is `private[sql]`, the
  * same hosting pattern Spark's own kafka module uses. The DSv2
  * `MicroBatchStream` alternative would force a hand-rolled row-level
  * parquet reader — slower and a reimplementation of what Spark already
  * does best.
  */
final class LakeStreamSource(
    session: ClassicSession,
    catalog: LakeCatalog,
    db: String,
    table: String,
    startAfter: Option[Long],
    skipNonAppends: Boolean,
    branch: Option[String],
    maxSnapshotsPerTrigger: Option[Int] = None,
    metadataPath: Option[String] = None,
    /** CDC mode (r10, option `changelog=true`): micro-batches are
      * row-level CHANGE feeds ([[LakeTable.readChangelog]] per offset
      * range — `_change_type` INSERT/DELETE rows for appends, MoR
      * deletes and updates; compactions emit nothing) instead of
      * append-only row feeds — the streaming twin of
      * `create_changelog_view`, the Delta-CDF/Iceberg-changelog shape a
      * downstream incremental materializer consumes. */
    changelog: Boolean = false) extends Source {

  // ---- rate-limit cursor (only consulted when the cap is set) ----
  private val cursorFile: Option[java.nio.file.Path] = metadataPath
    .filter(_ => maxSnapshotsPerTrigger.isDefined)
    .map(p => Paths.get(p.stripPrefix("file:")).resolve("graft-rate-cursor"))
  private var persisted: Option[Long] = cursorFile.flatMap { f =>
    try {
      if (java.nio.file.Files.exists(f))
        Some(new String(java.nio.file.Files.readAllBytes(f), "UTF-8").trim.toLong)
      else None
    } catch { case scala.util.control.NonFatal(_) => None }
  }
  private var lastReturned: Option[Long] = persisted
  private def persistCursor(id: Long): Unit = cursorFile.foreach { f =>
    try { // best effort: loss degrades to one empty batch, never wrong data
      java.nio.file.Files.createDirectories(f.getParent)
      val tmp = f.resolveSibling(s".graft-rate-cursor.${java.util.UUID.randomUUID()}.tmp")
      java.nio.file.Files.write(tmp, id.toString.getBytes("UTF-8"))
      java.nio.file.Files.move(tmp, f,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } catch { case scala.util.control.NonFatal(_) => () }
  }
  /** In-memory only — the cap's latch for the RUNNING query (getOffset
    * must not re-offer a returned-but-not-yet-batched range on the next
    * poll). Durability is getBatch's job: MicroBatchExecution writes the
    * offset WAL BEFORE calling getBatch, so persisting there can never
    * leave the on-disk cursor ahead of the checkpoint. (The r8 ordering
    * persisted from getOffset — pre-WAL — and a crash in that window
    * made a restarted Trigger.AvailableNow run report the backlog
    * drained while (committedEnd, cursor] sat withheld until a fresh
    * commit moved the head.) */
  private def latchReturned(id: Long): Unit =
    if (maxSnapshotsPerTrigger.isDefined && !lastReturned.exists(_ >= id))
      lastReturned = Some(id)

  /** getBatch-side: the offset is in Spark's offset log by now, so it is
    * safe to make the cursor durable. `persisted` is tracked apart from
    * the latch — getOffset latches first, so a lastReturned-guarded
    * write here would never fire. */
  private def noteDelivered(id: Long): Unit = {
    latchReturned(id)
    if (maxSnapshotsPerTrigger.isDefined && !persisted.exists(_ >= id)) {
      persisted = Some(id)
      persistCursor(id)
    }
  }

  /** Every poll re-checks the SELECT grant (same session-principal rule
    * as every other read surface — dispatcher, DSv2 scan, native
    * splice): a stream is a long-lived reader, so a revocation takes
    * effect at the next micro-batch, not never. */
  private def loadTable(): LakeTable = {
    val t = catalog.loadTable(db, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft-lake stream source: table $db.$table does not exist " +
          s"under ${catalog.warehouse}"))
    t.requireGrant("SELECT")
    t
  }

  override val schema: StructType =
    if (!changelog) loadTable().schema
    else StructType(loadTable().schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField(
        LakeTable.ChangeTypeCol, org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(
        LakeTable.ChangeOrdinalCol, org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField(
        LakeTable.ChangeSnapshotCol, org.apache.spark.sql.types.LongType)))

  /** Latest available offset = the tailed ref's head snapshot id (main's
    * current, or the branch head with option `branch`). The reload is a
    * header-scale metadata read; polling cost is independent of table
    * size. The incremental walk follows parent lineage, so a branch tail
    * delivers exactly the branch's commits. */
  override def getOffset: Option[OffsetV1] = {
    val t = loadTable()
    val m = t.meta
    val cur = branch.fold(m.currentSnapshotId)(b =>
      m.branches.getOrElse(b, throw new IllegalArgumentException(
        s"graft-lake stream source: no branch $b on ${m.name} " +
          s"(branches: ${m.branches.keys.toSeq.sorted.mkString(", ")})")))
    // the cap advances from the last RETURNED offset (persisted), not
    // the head — otherwise every poll would re-offer the whole backlog
    val base = lastReturned.orElse(startAfter)
    if (cur < 0 || base.exists(_ >= cur)) None
    else {
      val end = maxSnapshotsPerTrigger
        .fold(cur)(n => t.boundedIncrementalEnd(base, cur, n))
      latchReturned(end)
      Some(LongOffset(end))
    }
  }

  /** Offsets round-trip through the checkpoint as JSON; after restart
    * Spark hands back a SerializedOffset whose json is the raw long. */
  private def snapshotId(o: OffsetV1): Long = o match {
    case l: LongOffset => l.offset
    case other => other.json.trim.toLong
  }

  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    val from = start.map(snapshotId).orElse(startAfter)
    val endId = snapshotId(end)
    // self-heal the rate cursor from the checkpoint's own range (a lost
    // cursor otherwise re-caps from table start → an end at or behind
    // the committed start; deliver that as an EMPTY batch rather than an
    // inverted incremental range)
    noteDelivered(endId)
    from.foreach(noteDelivered)
    if (from.exists(_ >= endId))
      return session.internalCreateDataFrame(
        session.sparkContext.emptyRDD[org.apache.spark.sql.catalyst.InternalRow],
        schema, isStreaming = true)
    val lt = loadTable()
    if (changelog) {
      // CDC batches: schema evolution mid-stream is not alias-repairable
      // here (the change feed adds computed columns); demand a restart
      val cdf = lt.readChangelog(from, endId)
      if (cdf.schema != schema) throw new IllegalStateException(
        s"graft-lake stream source: $db.$table changed schema mid-stream " +
          s"(changelog stream started with ${schema.simpleString}) — " +
          "restart the query to adopt it")
      // the diff plan carries the MoR anti-joins; re-tagging its scan
      // leaves streaming would make Spark plan them as stream-stream
      // joins (rejected for LeftAnti). CDC batches are change-scale, so
      // wrapping the executed RDD is the correct shape here.
      return session.internalCreateDataFrame(
        cdf.queryExecution.toRdd, cdf.schema, isStreaming = true)
    }
    val df0 = lt.readIncremental(from, endId, skipNonAppends)
    // M48 interplay: the STREAM's schema is fixed at query start, but a
    // mid-stream RENAME makes the table (and this batch) surface new
    // names. Renames are value-preserving, so the batch aliases back to
    // the stream-start names until the consumer restarts (then it picks
    // up the new spelling from a fresh `schema`). A structural or
    // type-level change (add/drop/widen) cannot be served under the old
    // schema without inventing or truncating values — fail by name and
    // ask for a restart instead of binding positionally by luck.
    // Rename-only is PROVEN against the table's logged schema changes
    // (ADVICE r9 #3), not inferred from the type sequence: a DROP+ADD
    // pair that happens to preserve the type positions (drop last STRING,
    // add another STRING) has no rename chain from the stream-start name
    // and must fail, never silently serve the new column's values under
    // the dropped column's name.
    def renameOnly: Boolean = {
      val renames = lt.meta.schemaChanges.filter(_.kind == "rename")
      val evolved = schema.fieldNames.map(n0 =>
        renames.foldLeft(n0)((n, ch) => if (ch.from == n) ch.col else n))
      evolved.sameElements(df0.schema.fieldNames)
    }
    val df =
      if (df0.schema == schema) df0
      else if (df0.schema.fields.map(_.dataType).toSeq ==
          schema.fields.map(_.dataType).toSeq && renameOnly)
        df0.select(df0.columns.zip(schema.fieldNames).map {
          case (from0, to) => org.apache.spark.sql.functions.col(from0).as(to)
        }.toIndexedSeq: _*)
      else throw new IllegalStateException(
        s"graft-lake stream source: $db.$table changed schema mid-stream " +
          s"(stream started with ${schema.simpleString}, table now has " +
          s"${df0.schema.simpleString}) — restart the query to adopt it")
    LakeStreamSource.asStreamingBatch(session, df)
  }

  override def stop(): Unit = ()
}

object LakeStreamSource {
  /** Re-tag a batch DataFrame as a streaming micro-batch.
    * MicroBatchExecution asserts `isStreaming` on what getBatch returns;
    * flipping the flag on the parquet [[LogicalRelation]] leaf keeps the
    * whole DECLARATIVE plan — the sink's filters/projections still reach
    * the vectorized scan through the normal optimizer, which a
    * pre-materialized RDD would forfeit. The empty-range scan (no leaf
    * relation — a LocalRelation/LogicalRDD stub) falls back to wrapping
    * the executed RDD, which for an empty batch carries no work. */
  private[graft] def asStreamingBatch(
      session: ClassicSession, df: DataFrame): DataFrame = {
    val tagged = df.queryExecution.analyzed.transform {
      case lr: LogicalRelation if !lr.isStreaming => lr.copy(isStreaming = true)
    }
    if (tagged.isStreaming) ClassicDataset.ofRows(session, tagged)
    else session.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}

/** Structured Streaming SINK over a lake table — the write half of the
  * `graft-lake` format, so a full mirror pipeline is just
  * `readStream.format("graft-lake") … writeStream.format("graft-lake")`.
  *
  * Default (append) mode commits each micro-batch as ONE append
  * snapshot with the batch id recorded in the same atomic commit
  * ([[StreamIngest.commitBatch]]), so a replayed micro-batch after a
  * crash is recognized and skipped — exactly-once table state from
  * Spark's at-least-once delivery. With option `keys=k1,k2`, each batch
  * lands as an O(batch) equality-delete upsert instead
  * ([[StreamIngest.upsertBatch]]: no target read, converges by value on
  * redelivery) — the only write shape that holds when the table is
  * 100 TB and batches are megabytes. Both paths retry commit conflicts
  * by reloading (appends additionally rebase inside the engine). */
final class LakeStreamSink(
    session: ClassicSession,
    catalog: LakeCatalog,
    db: String,
    table: String,
    keys: Seq[String],
    branch: Option[String] = None) extends Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // the incoming frame is bound to the streaming incremental plan;
    // re-wrap its executed RDD as a plain batch frame (ForeachBatchSink's
    // own pattern) so the lake write can repartition/plan it freely
    val batch = session.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
    // this load is the GRANT gate only — the commit bodies re-load per
    // attempt by design (conflict retries must see fresh state)
    val t = catalog.loadTable(db, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft-lake sink: table $db.$table does not exist under " +
          s"${catalog.warehouse}"))
    t.requireGrant("INSERT")
    // an equality upsert hides existing rows — that is a row-removing
    // write, so keys mode needs the same DELETE grant the dispatcher and
    // DSv2 row-level DML require (INSERT alone must not delete by upsert)
    if (keys.nonEmpty) t.requireGrant("DELETE")
    if (keys.isEmpty)
      StreamIngest.commitBatch(catalog, db, table, branch)(batch, batchId)
    else StreamIngest.upsertBatch(catalog, db, table, keys, branch)(batch)
  }
}

/** `.format("graft-lake")` registration (via META-INF/services). */
final class LakeStreamSourceProvider
    extends StreamSourceProvider with StreamSinkProvider with DataSourceRegister {

  override def shortName(): String = "graft-lake"

  private def resolve(
      sqlContext: SQLContext,
      parameters: Map[String, String]): (LakeCatalog, String, String) = {
    val wh = parameters.getOrElse("warehouse", throw new IllegalArgumentException(
      "graft-lake source requires option 'warehouse' (lake warehouse path)"))
    val ref = parameters.getOrElse("table", throw new IllegalArgumentException(
      "graft-lake source requires option 'table' as 'db.table'"))
    ref.split('.') match {
      case Array(db, t) =>
        (new LakeCatalog(sqlContext.sparkSession, Paths.get(wh)), db, t)
      case _ => throw new IllegalArgumentException(
        s"graft-lake option 'table' must be 'db.table', got '$ref'")
    }
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val (cat, db, t) = resolve(sqlContext, parameters)
    val lake = cat.loadTable(db, t).getOrElse(
      throw new IllegalArgumentException(
        s"graft-lake stream source: table $db.$t does not exist under " +
          s"${cat.warehouse}"))
    lake.requireGrant("SELECT") // schema disclosure is already a read
    val declared =
      if (!parameters.get("changelog").exists(_.toBoolean)) lake.schema
      else StructType(lake.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField(
          LakeTable.ChangeTypeCol, org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField(
          LakeTable.ChangeOrdinalCol, org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField(
          LakeTable.ChangeSnapshotCol, org.apache.spark.sql.types.LongType)))
    // a user-supplied schema must not silently diverge from the table's
    schema.filter(_ != declared).foreach { s =>
      throw new IllegalArgumentException(
        s"graft-lake source: supplied schema $s does not match table " +
          s"$db.$t schema $declared — omit .schema(), the table declares it")
    }
    (shortName(), declared)
  }

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source = {
    val (cat, db, t) = resolve(sqlContext, parameters)
    val cap = parameters.get("maxSnapshotsPerTrigger").map { v =>
      val n = v.toInt
      if (n <= 0) throw new IllegalArgumentException(
        s"graft-lake source: maxSnapshotsPerTrigger must be positive, got $v")
      n
    }
    new LakeStreamSource(
      sqlContext.sparkSession.asInstanceOf[ClassicSession], cat, db, t,
      parameters.get("startSnapshotId").map(_.toLong),
      parameters.get("skipNonAppends").exists(_.toBoolean),
      parameters.get("branch"),
      cap,
      Some(metadataPath),
      changelog = parameters.get("changelog").exists(_.toBoolean))
  }

  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    val (cat, db, t) = resolve(sqlContext, parameters)
    if (partitionColumns.nonEmpty) throw new IllegalArgumentException(
      "graft-lake sink: the table declares its own partitioning; " +
        "drop .partitionBy(…)")
    if (outputMode == OutputMode.Complete()) throw new IllegalArgumentException(
      "graft-lake sink supports append (snapshot per batch) and " +
        "update-with-keys (equality upsert), not complete mode")
    val keys = parameters.get("keys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    if (outputMode == OutputMode.Update() && keys.isEmpty)
      throw new IllegalArgumentException(
        "graft-lake sink in update mode needs option keys=k1[,k2…] " +
          "(which columns identify a row for the equality upsert)")
    new LakeStreamSink(
      sqlContext.sparkSession.asInstanceOf[ClassicSession], cat, db, t, keys,
      parameters.get("branch"))
  }
}
