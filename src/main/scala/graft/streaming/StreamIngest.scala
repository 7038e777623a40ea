package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

import graft.lake.{CommitConflictException, LakeCatalog}

/** Open-session state for [[StreamIngest.sessionize]] (epoch millis). */
final case class SessionState(start: Long, lastSeen: Long, events: Long)

/** One closed session emitted by [[StreamIngest.sessionize]]. */
final case class SessionOut(
    key: String,
    session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp,
    n_events: Long)

/** §2.10 streaming ingest: Structured Streaming file source → lake table.
  *
  * The reference has no streaming surface; this is the north-star
  * extension mapped onto `readStream` → transforms → `foreachBatch` into
  * the engine's append/commit path (S4), so a stream lands as ordinary
  * lake snapshots — one commit per micro-batch, readable mid-stream by
  * any MoR-aware scan.
  */
object StreamIngest {

  /** Table property recording the last micro-batch id committed by the
    * streaming sink (one ingest stream per table — the engine's
    * single-writer model). */
  val LastBatchProp = "streaming.last-batch-id"

  /** The standing docs/index tables are provisioned MERGE-ON-READ so
    * standing-state maintenance ([[graft.operators.IndexMaintenance]])
    * can retire or replace a changed doc's rows with O(changed-rows)
    * equality-delete commits — never a corpus rewrite; compaction
    * ([[graft.lake.Procedures.rewriteDataFiles]]) folds the deletes in
    * on its own schedule. */
  private[graft] val MorProps = Map("write.delete.mode" -> "merge-on-read")

  /** Reload-and-retry around a CAS-guarded sink commit: a maintenance
    * writer (compaction, expiry) landing between the sink's table load
    * and its commit makes the handle stale → CommitConflictException.
    * Concurrent ingest + maintenance is the NORMAL state of a 100 TB
    * table, so the sink retries from a fresh load (each `body` reloads)
    * rather than failing the whole streaming query; both sink bodies are
    * idempotent (batch-id gate / by-value merge), so a retry after the
    * conflict converges. Bounded: a pathological commit storm surfaces
    * the last conflict instead of spinning. */
  private def retryingCommit[A](attempts: Int = 5)(body: => A): A = {
    var left = attempts
    while (true) {
      try return body
      catch {
        case e: CommitConflictException =>
          left -= 1
          if (left <= 0) throw e
      }
    }
    sys.error("unreachable")
  }

  /** Idempotent micro-batch commit (VERDICT r3 #3 wrong-list): on
    * restart/retry Structured Streaming re-delivers the last uncommitted
    * micro-batch with the SAME batchId, so the sink records the committed
    * id as a table property in the same atomic snapshot commit as the
    * data, and drops any batch at-or-below it. Append + property move
    * together, so a crash between them is impossible and replays converge
    * to exactly-once.
    *
    * A missing target table must FAIL the batch, not ack it: a silent
    * no-op would advance the streaming checkpoint and drop the
    * micro-batch irrecoverably while the query reports healthy. */
  private def targetTable(catalog: LakeCatalog, db: String, table: String) =
    catalog.loadTable(db, table).getOrElse(throw new IllegalStateException(
      s"streaming sink target $db.$table does not exist — failing the " +
        "batch so the checkpoint does not advance past dropped data"))

  def commitBatch(catalog: LakeCatalog, db: String, table: String,
      branch: Option[String] = None)(
      batch: DataFrame, batchId: Long): Unit =
    retryingCommit() {
      val t0 = targetTable(catalog, db, table)
      val t = branch.fold(t0)(t0.onBranch)
      // per-ref replay marker: a main sink and a branch sink on the same
      // table are distinct streams with independent batch-id sequences
      val prop = branch.fold(LastBatchProp)(b => s"$LastBatchProp.$b")
      val alreadyCommitted =
        t.meta.props.get(prop).exists(_.toLong >= batchId)
      if (!alreadyCommitted)
        t.append(batch, Map(prop -> batchId.toString))
    }

  /** Raw ingest: every micro-batch becomes one append snapshot on
    * `db.table`. The foreachBatch reloads the table from the catalog each
    * batch — commits are the serialization point, matching the engine's
    * single-writer model. */
  def ingestRaw(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      table: String): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch(commitBatch(catalog, db, table) _)
      .start()

  /** Dedup-at-ingest: the streaming half of the exact-dedup tier (q29/
    * q55) — documents entering on a stream are deduplicated BY CONTENT
    * before they ever land in the lake, so the corpus never accumulates
    * the duplicate mass a batch pass would later have to remove. Keys
    * are the 128-bit `(xxhash64(text), xxhash64(reverse(text)))` pair
    * (q55's whp-collision-free device) — per-doc state is 16 bytes, not
    * the payload — and `dropDuplicatesWithinWatermark` bounds that state
    * to the watermark horizon: at 100 TB/day ingest the state store
    * holds only the horizon's worth of hashes, the one shape that
    * doesn't grow without bound. The trade is explicit: a duplicate
    * re-arriving AFTER the horizon re-admits (state for the original has
    * expired); the batch exact-dedup (q29) downstream is the backstop
    * for cross-horizon duplicates, exactly how production pipelines
    * layer the two. Output lands via [[commitBatch]] — one append
    * snapshot per micro-batch, replay-safe on the batch-id gate. */
  def dedupIngest(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      table: String,
      tsCol: String,
      textCol: String,
      horizon: String = "1 hour"): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .withColumn("h1", xxhash64(col(textCol)))
      .withColumn("h2", xxhash64(reverse(col(textCol))))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("h1", "h2")
      .drop("h1", "h2")
      .writeStream
      .foreachBatch(commitBatch(catalog, db, table) _)
      .start()

  /** Streaming windowed counts MATERIALIZED in a lake table via MERGE
    * upserts: update-mode emits each changed (window, type) row with its
    * current TOTAL count, and the micro-batch merges it — matched window
    * rows update, new ones insert — in one atomic commit. Totals-upsert
    * is idempotent by value, so a redelivered batch converges instead of
    * double-counting; the aggregation state stays watermark-bounded in
    * the engine while the table always holds the latest materialized
    * view. Target schema: (win_start TIMESTAMP, event_type STRING,
    * cnt BIGINT). */
  def upsertWindowedCounts(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      table: String,
      tsCol: String,
      typeCol: String): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"),
        col(typeCol).as("event_type"), col("cnt"))
      .writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        retryingCommit() {
          targetTable(catalog, db, table).merge(batch,
            col("t.win_start") === col("s.win_start") &&
              col("t.event_type") === col("s.event_type"),
            Some(graft.lake.MergeMatched.Update(
              Map("cnt" -> col("s.cnt")))),
            insertNotMatched = true)
        }
        ()
      }
      .start()

  /** Streaming equality-delete upserts — the scale path next to
    * [[upsertWindowedCounts]]'s MERGE: each micro-batch lands as ONE
    * snapshot (new data files + an equality-delete file over `keyCols`)
    * via [[graft.lake.LakeTable.upsertByKey]], WITHOUT reading the
    * target. MERGE joins the table every batch — O(table); this is
    * O(batch), the only shape that holds when the table is 100 TB and
    * batches are megabytes. Redelivered batches converge by value (the
    * replayed delete hides the first copy), so no batch-id gate is
    * needed; conflict retries rebase inside upsertByKey itself, with the
    * sink's retry loop covering metadata races around it. */
  def upsertByKeyStream(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      table: String,
      keyCols: Seq[String]): StreamingQuery =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(catalog, db, table, keyCols)(batch)
      }
      .start()

  /** One micro-batch equality-delete upsert with conflict retries — the
    * per-batch body shared by [[upsertByKeyStream]] and the
    * `graft-lake` writeStream sink's `keys` mode.
    *
    * Enforces upsertByKey's at-most-one-row-per-key-per-batch contract:
    * the batch's rows and its equality delete share ONE sequence number,
    * so neither of two same-key rows hides the other (strictly-older
    * rule) and the table would keep BOTH forever. A raw, unaggregated
    * stream hits this silently — fail loudly instead (one small agg over
    * the micro-batch, O(batch)). */
  def upsertBatch(catalog: LakeCatalog, db: String, table: String,
      keyCols: Seq[String], branch: Option[String] = None)(
      batch: DataFrame): Unit = {
    val dup = batch.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__graft_cnt"))
      .filter(col("__graft_cnt") > 1).limit(1).collect()
    if (dup.nonEmpty) throw new IllegalArgumentException(
      s"upsert micro-batch carries multiple rows for key " +
        s"(${keyCols.mkString(", ")}) = " +
        s"(${dup.head.toSeq.dropRight(1).mkString(", ")}): equality " +
        "upserts apply at one sequence number, so in-batch duplicates " +
        "would BOTH survive. Aggregate the stream to one row per key " +
        "(e.g. latest by event time) before the sink.")
    retryingCommit() {
      val t0 = targetTable(catalog, db, table)
      branch.fold(t0)(t0.onBranch).upsertByKey(batch, keyCols)
    }
    ()
  }

  /** Streaming sessionization via `flatMapGroupsWithState` — the §2.10
    * custom-state showcase and the streaming twin of q42's batch
    * gaps-and-islands sessions. One [[SessionState]] per key; a session
    * closes when the event-time watermark passes `lastSeen + gap`
    * (EventTimeTimeout), so state is watermark-bounded: no key keeps
    * state past one idle gap. Within a batch, events are processed in
    * time order and a gap splits the batch into multiple emitted
    * sessions — the state never holds more than the single open tail
    * session. Late rows beyond the watermark are dropped by the engine
    * before the state function sees them. */
  def sessionize(
      spark: SparkSession,
      stream: DataFrame,
      tsCol: String,
      keyCol: String,
      gapMinutes: Int): org.apache.spark.sql.Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val gapMs = gapMinutes * 60000L
    stream
      // project first: a cast AFTER withWatermark would mint a fresh
      // attribute without the event-time tag and fail the streaming check
      .select(col(keyCol).cast("string").as("k"),
        col(tsCol).cast("timestamp").as("ts"))
      // null event times pass the watermark filter (they compare as
      // neither late nor on-time) and would NPE in the state function
      // forever — a permanent poison pill across restarts
      .filter(col("k").isNotNull && col("ts").isNotNull)
      .withWatermark("ts", s"$gapMinutes minutes")
      .as[(String, java.sql.Timestamp)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(key, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.lastSeen), s.events))
          } else {
            val times = rows.map(_._2.getTime).toArray.sorted
            var open = state.getOption
            val closed = Seq.newBuilder[SessionOut]
            times.foreach { t =>
              open = open match {
                case Some(s) if t <= s.lastSeen + gapMs =>
                  Some(s.copy(lastSeen = math.max(s.lastSeen, t),
                    events = s.events + 1))
                case Some(s) => // in-batch gap: close, start the next
                  closed += SessionOut(key, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.lastSeen), s.events)
                  Some(SessionState(t, t, 1))
                case None => Some(SessionState(t, t, 1))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastSeen + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Watermarked 1-hour tumbling counts per event type (the streaming
    * twin of q30's batch window). Late data beyond the watermark is
    * dropped by the engine; the aggregation state is bounded. */
  def windowedCounts(stream: DataFrame, tsCol: String, typeCol: String): DataFrame =
    stream
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour"), col(typeCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col(typeCol), col("cnt"))

  /** Watermarked SLIDING (hopping) counts per event type — 1-hour
    * windows advancing every 15 minutes, the smooth-series form trend
    * dashboards read instead of tumbling steps. Spark expands each row
    * into its length/slide = 4 overlapping window assignments map-side
    * BEFORE the shuffle, so the fan-out is the slide ratio (bounded,
    * chosen here), never the window count; watermarking bounds the
    * open-window state exactly as with tumbling. */
  def slidingCounts(stream: DataFrame, tsCol: String, typeCol: String): DataFrame =
    stream
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour", "15 minutes"), col(typeCol))
      .agg(count(lit(1)).as("cnt"))
      .select(col("window.start").as("win_start"), col(typeCol), col("cnt"))

  /** Watermarked sliding APPROXIMATE DISTINCT users — the streaming twin
    * of [[graft.operators.SketchWau]]'s rolling WAU: exact streaming
    * COUNT(DISTINCT) cannot run in a streaming aggregation (per-window
    * distinct state is unbounded and does not decompose across
    * micro-batches), but the HLL sketch aggregate streams naturally —
    * its partial state is a FIXED-SIZE register array per open window,
    * merged across micro-batches by register max and watermark-bounded
    * like any windowed agg. Same 1-hour/15-minute hop as
    * [[slidingCounts]] (slide-ratio fan-out = 4, map-side). Emits the
    * estimate per window; the stored-sketch form for later arbitrary
    * windows is [[graft.operators.SketchWau]] — this is the
    * live-dashboard spelling. */
  def slidingDistinctUsers(stream: DataFrame, tsCol: String,
                           idCol: String): DataFrame =
    stream
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour", "15 minutes"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col(idCol)))
        .as("approx_users"))
      .select(col("window.start").as("win_start"), col("approx_users"))

  /** Watermarked sliding HEAVY HITTERS — the frequency member of the
    * live-dashboard trio ([[slidingCounts]] = totals,
    * [[slidingDistinctUsers]] = distincts): "top keys per window" with
    * BOUNDED state. An exact per-(window, key) count aggregate carries
    * state proportional to the window's key cardinality — unbounded on
    * a 100 TB key stream; the mergeable Misra–Gries summary
    * ([[graft.functions.MgSummaryAgg]], PODS'12 merge rule) carries
    * EXACTLY `s` counters per open window, merged across micro-batches
    * in the state store like any agg buffer, with the spec-gated
    * guarantee that every key above n/(s+1) window share survives and
    * reported counts sit within n/(s+1) of truth. Emits the summary
    * array per window; exactness-critical consumers recount the
    * candidates (q117's pattern) — the stored-state form for arbitrary
    * later windows is [[graft.operators.SketchHeavyHitters]]. */
  def slidingHeavyHitters(stream: DataFrame, tsCol: String,
                          keyCol: String, s: Int = 16): DataFrame =
    stream
      .withWatermark(tsCol, "1 hour")
      .groupBy(window(col(tsCol), "1 hour", "15 minutes"))
      .agg(graft.functions.Mg.summary(s, col(keyCol).cast("long"))
        .as("top"))
      .select(col("window.start").as("win_start"), col("top"))

  // ------------------------------------------------ streaming NEAR-dup

  import graft.operators.PrefixIndex

  /** Provision the standing near-dup state for [[nearDupIngest]] from an
    * initial corpus (possibly empty): the docs landing table plus the
    * three index tables q167 reads — shingle sets, rare-first prefix
    * postings, and the df head that fixes the corpus-global class order.
    * In production this is the one-time backfill; [[nearDupIngest]] then
    * GROWS docs/shingles/postings with every micro-batch while the head
    * stays fixed (staleness affects only bucket sizes — cost — never
    * recall: the pigeonhole cover needs order consistency, not df
    * accuracy; rebuild the head offline when bucket skew warrants). */
  def provisionNearDupState(
      catalog: LakeCatalog,
      db: String,
      schema: StructType,
      initial: DataFrame): Unit = {
    import org.apache.spark.sql.types._
    catalog.createTable(db, "docs", schema, props = MorProps)
      .append(initial)
    val docsSh = PrefixIndex.shingled(initial)
    val hashed = PrefixIndex.hashed(docsSh)
    val head = PrefixIndex.dfHead(hashed)
    catalog.createTable(db, "shingles", StructType(Seq(
        StructField("doc_id", LongType),
        StructField("sh", ArrayType(StringType)))), props = MorProps)
      .append(docsSh)
    catalog.createTable(db, "postings", StructType(Seq(
        StructField("h", LongType), StructField("doc_id", LongType),
        StructField("k", IntegerType), StructField("pos", IntegerType))),
        props = MorProps)
      .append(PrefixIndex.postings(hashed, head))
    val s = initial.sparkSession
    import s.implicits._
    catalog.createTable(db, "dfhead", StructType(Seq(
        StructField("h", LongType), StructField("df", LongType))))
      .append(head.toSeq.toDF("h", "df"))
  }

  /** Streaming NEAR-dup ingest against the standing corpus — the
    * CONTINUOUS form of q167's nightly shape (X44): each micro-batch is
    * shingled, prefix-indexed under the STORED df-head order, equi-joined
    * against the stored postings lake table plus itself, exact-verified
    * (jac ≥ 0.8, the [[PrefixIndex.verifyPairs]] budget-gated device),
    * and only NON-near-dup survivors land — in the docs table AND the
    * shingle/posting index tables, so the state grows with every batch
    * and later arrivals dedup against earlier ones. Drop rule (greedy
    * first-writer-wins, [[dedupIngest]]'s semantics lifted from exact to
    * near): a batch doc is dropped iff it verifies against a STORED doc
    * or a smaller-id doc of the SAME batch. Per-batch cost is O(batch)
    * — the standing corpus is touched only through the postings
    * equi-join and the candidate-filtered shingle fetch.
    *
    * Crash/replay: the three commits are each idempotent on their own
    * [[LastBatchProp]] gate, so a redelivered batch completes whichever
    * table lagged. Recomputation against state that already contains
    * this batch's own survivors is CONVERGENT: self-pairs are excluded
    * by id, and committed survivors are mutually non-near-dup by
    * construction, so the recomputed survivor set is identical. */
  def nearDupIngest(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
    // a persistent checkpoint makes batch ids CONTINUE across query
    // restarts — the deployment posture the per-table LastBatchProp
    // idempotence gate assumes (a fresh checkpoint restarts ids at 0,
    // which the gate reads as already-committed replays)
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch: DataFrame, batchId: Long) =>
        val head = loadHead(spark, catalog, db)
        val (survivors, survSh) =
          nearDupSurvivors(spark, batch, catalog, db, head)
        // postings/shingles first, docs last: the docs table is the
        // externally-visible landing surface, so a crash mid-sequence
        // never exposes a doc whose index rows are missing
        commitBatch(catalog, db, "postings")(
          PrefixIndex.postings(PrefixIndex.hashed(survSh), head), batchId)
        commitBatch(catalog, db, "shingles")(survSh, batchId)
        commitBatch(catalog, db, "docs")(survivors, batchId)
      }
      .start()
  }

  /** Bounded driver pull: the head table is ≤ [[PrefixIndex.DfHeadMax]]
    * rows by construction. */
  private[graft] def loadHead(spark: SparkSession, catalog: LakeCatalog,
      db: String): Map[Long, Long] = {
    import spark.implicits._
    catalog.loadTable(db, "dfhead").get.read()
      .as[(Long, Long)].collect().toMap
  }

  /** The batch minus its verified near-dups (vs stored state and vs
    * smaller-id batch peers), plus the survivors' SHINGLES — the batch
    * is shingled exactly once; the index commit reuses this table
    * instead of re-shingling survivor texts (r16 review). Eagerly
    * materialized (the micro-batch is bounded) so the three commits
    * above reuse one computation. */
  private def nearDupSurvivors(
      spark: SparkSession, batch: DataFrame,
      catalog: LakeCatalog, db: String,
      head: Map[Long, Long]): (DataFrame, DataFrame) = {
    val batchSh = PrefixIndex.shingled(batch)
      .localCheckpoint(true) // postings, verify union, ids AND survSh
    val batchPost = PrefixIndex.postings(PrefixIndex.hashed(batchSh), head)
      .localCheckpoint(true) // consumed twice: cross equi-join + self
    val storedPost = catalog.loadTable(db, "postings").get.read()
    // id-inequality (not disjointness): on crash-replay the stored side
    // may already contain THIS batch's survivors — a doc must never
    // near-dup its own committed copy
    val cross = batchPost.as("n")
      .join(storedPost.as("o"), col("n.h") === col("o.h") &&
        col("n.doc_id") =!= col("o.doc_id"))
      .filter(expr(PrefixIndex.pairFilter("n.k", "n.pos", "o.k", "o.pos")))
      .select(least(col("n.doc_id"), col("o.doc_id")).as("doc_a"),
        greatest(col("n.doc_id"), col("o.doc_id")).as("doc_b"))
    val cand = cross.union(PrefixIndex.postingsPairs(batchPost)).distinct()
      .localCheckpoint(true)
    val allSh = catalog.loadTable(db, "shingles").get.read()
      .unionByName(batchSh)
    // corpusPreGate = false: the stored shingle table grows forever, so
    // the pre-gate's whole-table aggregate would make every trigger
    // corpus-scale; the candidate-level probes are batch-scale
    val verified = PrefixIndex.verifyPairs(allSh, cand,
      corpusPreGate = false)
    // victim selection: the batch side of a (batch, stored) pair; the
    // larger id of a (batch, batch) pair
    val bIds = batchSh.select(col("doc_id"))
    val aNew = bIds.select(col("doc_id").as("doc_a"), lit(true).as("a_new"))
    val bNew = bIds.select(col("doc_id").as("doc_b"), lit(true).as("b_new"))
    val drops = verified
      .join(broadcast(aNew), Seq("doc_a"), "left")
      .join(broadcast(bNew), Seq("doc_b"), "left")
      .select(
        when(col("a_new").isNotNull && col("b_new").isNotNull,
          greatest(col("doc_a"), col("doc_b")))
          .when(col("a_new").isNotNull, col("doc_a"))
          .otherwise(col("doc_b")).as("doc_id"))
      .distinct()
    val survivors = batch.join(broadcast(drops), Seq("doc_id"), "left_anti")
      .localCheckpoint(true)
    val survSh = batchSh
      .join(broadcast(survivors.select(col("doc_id"))), Seq("doc_id"))
    (survivors, survSh)
  }

  // -------------------------------- X48: streaming VECTOR dedup ingest
  /** Sign-bit SimHash signature of column `v` (ARRAY<DOUBLE>, first 64
    * dims): bit i set iff v[i] ≥ 0 — the exact q149/q162 signature, so
    * the streaming index blocks with the same geometry the batch ANN
    * family measured band parameters against. */
  private def signSig: Column = expr(
    "aggregate(transform(sequence(0, 63), " +
      "i -> IF(element_at(v, i + 1) >= 0D, shiftleft(1L, i), 0L)), " +
      "0L, (acc, x) -> acc | x)")

  /** (vec_id, band, bkey): 8 bands × 8 bits — radius-0 blocking, a
    * candidate pair shares at least one IDENTICAL band. At cosine ≥ 0.9
    * the per-bit flip probability is arccos(0.9)/π ≈ 0.14, so one band
    * survives with 0.86⁸ ≈ 0.30 and at least one of eight with
    * 1 − 0.70⁸ ≈ 0.94; at 0.95 it is ≈ 0.99. The miss probability is
    * the documented recall trade of signature blocking (q37/q149
    * posture) — the alternative, exact all-pairs per micro-batch
    * against the standing corpus, is the O(batch·corpus) job this
    * operator exists to avoid. */
  private[graft] def sigBands(vecs: DataFrame): DataFrame =
    vecs.withColumn("sig", signSig)
      .select(col("vec_id"), posexplode(expr(
        "transform(sequence(0, 7), b -> shiftrightunsigned(sig, b * 8) & 255L)"))
        .as(Seq("band", "bkey")))

  /** Finite-positive squared-norm predicate — the dedup-eligibility
    * gate for [[vectorDedupIngest]]. Spark orders NaN ABOVE every
    * double, so `> 0` alone would admit NaN norms (any NaN element)
    * and `>= 0` would admit Inf overflows; requiring `0 < n < +Inf`
    * excludes NULL, zero, NaN and Inf norms in one engine-portable
    * comparison (NaN < Inf is FALSE under Spark's NaN-greatest order).
    * Cosine against any excluded vector is NaN or undefined — and NaN
    * ≥ tau is TRUE under the same ordering, so letting one into the
    * index would make later arrivals "verify" against it and be
    * silently dropped (ADVICE r16 high). */
  private[graft] def finiteNorm: Column = {
    val n = expr("aggregate(v, 0D, (acc, x) -> acc + x * x)")
    n > lit(0D) && n < lit(Double.PositiveInfinity)
  }

  /** One-time standing state for [[vectorDedupIngest]]: the corpus
    * vectors and their signature-band index as lake tables. `initial`
    * columns: (vec_id LONG, v ARRAY<DOUBLE>). Only finite-norm vectors
    * are INDEXED — a zero/NaN vector's signature is meaningless (0 ≥ 0
    * sets every bit) and any band collision with it verifies at NaN
    * cosine, dropping innocent arrivals; the rows themselves still land
    * in the vectors table. */
  def provisionVectorDedupState(
      catalog: LakeCatalog,
      db: String,
      initial: DataFrame): Unit = {
    import org.apache.spark.sql.types._
    catalog.createTable(db, "vectors", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))), props = MorProps)
      .append(initial)
    catalog.createTable(db, "sigbands", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("band", IntegerType),
        StructField("bkey", LongType))), props = MorProps)
      .append(sigBands(initial.filter(finiteNorm)))
  }

  /** STREAMING near-duplicate VECTOR ingest (X48 — X44's semantics on
    * embeddings): per micro-batch, candidates = batch×stored +
    * batch×batch signature-band collisions, exact-cosine verified at
    * `tau` with vectors fetched through the byte-budget device (X42 —
    * never a forced corpus-sized broadcast), survivors appended to the
    * vectors AND index tables so the state grows and later arrivals
    * dedup against earlier survivors. Victim rule and crash-replay
    * convergence are [[nearDupIngest]]'s: batch side of a
    * (batch, stored) pair drops, larger id of a batch pair drops,
    * self-id pairs are excluded so a replayed batch converges against
    * its own committed copy. Vectors with a non-finite or zero squared
    * norm (zero vectors, NaN elements, Inf overflows) BYPASS dedup,
    * land directly, and are NEVER indexed: their signature is
    * meaningless (0 ≥ 0 sets every band bit) and cosine against them is
    * NaN, which Spark's NaN-greatest ordering would "verify" at any tau
    * — one indexed zero vector would then silently eat ~1/256-per-band
    * of all later arrivals (ADVICE r16 high). O(batch) per micro-batch:
    * the stored side is touched only through the band equi-join and the
    * budget-gated pair fetch. */
  def vectorDedupIngest(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      tau: Double = 0.9,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0
          .select(col("vec_id").cast("long").as("vec_id"), col("v"))
          .localCheckpoint(true)
        val nz = batch.filter(finiteNorm)
        // the bypass is the COMPLEMENT of nz by id, not a second
        // predicate: a null array yields a null norm that satisfies
        // neither `> 0` nor `<= 0`, so two filters would silently lose
        // the row (and NaN routing would ride on engine-specific NaN
        // ordering) — the anti-join makes nz ∪ z ≡ batch by construction
        val z = batch.join(nz.select(col("vec_id")),
          Seq("vec_id"), "left_anti")
        val nzSurvivors = vectorSurvivors(spark, nz, catalog, db, tau)
          .localCheckpoint(true)
        val survivors = nzSurvivors.unionByName(z)
        // index first, landing surface last (the nearDupIngest order);
        // ONLY finite-norm survivors enter the index — the bypass rows
        // land in the vectors table but never in sigbands
        commitBatch(catalog, db, "sigbands")(
          sigBands(nzSurvivors), batchId)
        commitBatch(catalog, db, "vectors")(survivors, batchId)
      }
      .start()
  }

  // ---------------------------------- X51: streaming IVF index ingest
  /** One-time standing state for [[ivfIngest]]: the codebook as a lake
    * table (cid, cv — the governed artifact a trainer publishes and
    * every consumer reads), the vector landing table, and the bucket
    * assignment index. `initial` columns: (vec_id LONG,
    * v ARRAY<DOUBLE>); `assign(initial)` must return one (vec_id,
    * bucket) row per input row. */
  def provisionIvfState(
      catalog: LakeCatalog,
      db: String,
      centroids: Array[Array[Double]],
      initial: DataFrame,
      assign: DataFrame => DataFrame): Unit = {
    import org.apache.spark.sql.types._
    val s = initial.sparkSession
    import s.implicits._
    catalog.createTable(db, "centroids", StructType(Seq(
        StructField("cid", LongType),
        StructField("cv", ArrayType(DoubleType)))))
      .append(centroids.zipWithIndex.toSeq
        .map { case (cv, i) => (i.toLong, cv.toSeq) }.toDF("cid", "cv"))
    catalog.createTable(db, "assign", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("bucket", LongType))), props = MorProps)
      .append(assign(initial)
        .select(col("vec_id"), col("bucket").cast("long").as("bucket")))
    catalog.createTable(db, "vectors", StructType(Seq(
        StructField("vec_id", LongType),
        StructField("v", ArrayType(DoubleType)))), props = MorProps)
      .append(initial)
  }

  /** Bounded driver pull of the stored codebook: K×d doubles by
    * construction (the q174 budget note). */
  def loadCentroids(spark: SparkSession, catalog: LakeCatalog,
      db: String): Array[Array[Double]] = {
    import spark.implicits._
    catalog.loadTable(db, "centroids").get.read()
      .as[(Long, Seq[Double])].collect().sortBy(_._1).map(_._2.toArray)
  }

  /** STREAMING IVF index ingest (X51 — the CONTINUOUS form of q174's
    * nightly maintenance): every micro-batch is routed through the
    * STORED codebook (the caller's compiled nearest-centroid pass — one
    * O(batch·K·d) scan, never a retrain) and lands in the vectors table
    * AND the assignment index, each behind its own batch-id-gated
    * idempotent commit (index first, landing surface last — the
    * [[nearDupIngest]] crash order). The codebook is read ONCE at query
    * start: it is versioned state a retrain publishes as a new
    * snapshot, at which point the stream restarts — mid-stream codebook
    * drift would make buckets of the same run mutually inconsistent.
    * Occupancy drift (the retrain trigger) is a q174/q177-style read of
    * the assign table at any time; retire/re-embed maintenance is
    * [[graft.operators.IndexMaintenance]] on the same tables. */
  def ivfIngest(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      assign: (DataFrame, Array[Array[Double]]) => DataFrame,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val cents = loadCentroids(spark, catalog, db)
    val w = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0
          .select(col("vec_id").cast("long").as("vec_id"), col("v"))
          .localCheckpoint(true) // consumed twice: assignment + landing
        commitBatch(catalog, db, "assign")(
          assign(batch, cents)
            .select(col("vec_id"), col("bucket").cast("long").as("bucket")),
          batchId)
        commitBatch(catalog, db, "vectors")(batch, batchId)
      }
      .start()
  }

  /** STREAMING k-NN graph ingest (X58's continuous form — the X51
    * pattern on the graph family): every micro-batch of (vec_id, v)
    * arrivals joins the standing graph through
    * [[graft.operators.GraphIndex]]'s append math — corpus + signature
    * upserts, then ONE edge swap rebuilding the new anchors AND every
    * standing anchor their signatures band-collide with. The
    * [[LastBatchProp]] gate rides the final edge-swap commit
    * ATOMICALLY (replaceByKey extraProps), so redelivery after any
    * crash replays the earlier idempotent-by-value commits and the
    * batch converges exactly-once on the serving surface; a batch
    * whose gate already advanced is dropped whole. Zero-norm arrivals
    * bypass (not graph members — the caller's landing table is a
    * separate concern, X48's convention). Retire/re-embed maintenance
    * and rebuild remain [[graft.operators.GraphIndex]] batch entries
    * on the same tables; the stream resumes from its checkpoint across
    * them (batch ids continue — the StreamingSpec restart arc). */
  def graphIngest(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch0: DataFrame, batchId: Long) =>
        retryingCommit() {
          val gate = targetTable(catalog, db, "gedges")
          val alreadyCommitted = gate.meta.props.get(LastBatchProp)
            .exists(_.toLong >= batchId)
          if (!alreadyCommitted)
            graft.operators.GraphIndex.appendVectors(catalog, db,
              batch0.select(col("vec_id").cast("long").as("vec_id"),
                col("v")),
              replay = true,
              gateProps = Map(LastBatchProp -> batchId.toString))
        }
      }
      .start()
  }

  /** STREAMING BM25 index ingest (X57's continuous form — the last
    * index family without one): every micro-batch of (doc_id, text)
    * arrivals folds into the maintained inverted index through
    * [[graft.operators.Bm25Index]]'s append math. Exactly-once rides
    * the family's own mechanisms, layered: the exact (n, Σdl) counter
    * delta is gated on an `s<batchId>` marker row (the CAS-loop
    * exactly-once of the batch maintainers, in a DISJOINT marker space
    * so stream batch ids can never collide with nightly event ids),
    * the postings commit is replaceByKey-idempotent by value, and the
    * [[LastBatchProp]] sink gate rides the FINAL (lens) commit
    * atomically — so any crash point replays convergently and a
    * fully-committed batch is dropped whole. Batch retire/recrawl
    * maintenance keeps running against the same tables between
    * restarts (their own eventId space); the stream resumes from its
    * checkpoint across them. */
  def bm25Ingest(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch0: DataFrame, batchId: Long) =>
        retryingCommit() {
          val gate = targetTable(catalog, db, "lens")
          val alreadyCommitted = gate.meta.props.get(LastBatchProp)
            .exists(_.toLong >= batchId)
          if (!alreadyCommitted)
            graft.operators.Bm25Index.appendDocs(catalog, db,
              batch0.select(col("doc_id").cast("long").as("doc_id"),
                col("text")),
              marker = s"s$batchId",
              gateProps = Map(LastBatchProp -> batchId.toString))
        }
      }
      .start()
  }

  /** STREAMING moment-state maintenance (X56's continuous form):
    * arriving embedding batches fold into the standing
    * (count, Σxᵢ, Σxᵢxⱼ) cells via [[graft.operators.MomentState]]'s
    * exact-decimal group law — each micro-batch costs one
    * O(batch·d²) moment pass plus the metadata-scale cell overwrite,
    * and the maintained cells stay bit-identical to a recompute over
    * everything ingested. Exactly-once needs NO extra marker: the
    * moments table's own crash-detection WATERMARK doubles as the
    * replay gate — the sink stamps `batchId + 1` as the delta token on
    * the single overwrite commit (data and marker atomic by
    * construction), so a redelivered batch sees watermark ≥ batchId+1
    * and is dropped. One stream owns the table's watermark space (the
    * family's single-writer contract); batch maintainers doing
    * retire/re-embed deltas between restarts must stamp
    * monotonically-later tokens, which the default token = watermark+1
    * already does. */
  def momentIngest(
      spark: SparkSession,
      srcDir: String,
      schema: StructType,
      catalog: LakeCatalog,
      db: String,
      d: Int,
      checkpointDir: Option[String] = None): StreamingQuery = {
    val w = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
    checkpointDir.foreach(c => w.option("checkpointLocation", c))
    w.foreachBatch { (batch0: DataFrame, batchId: Long) =>
        retryingCommit() {
          val added = batch0.select(col("v"))
          if (graft.operators.MomentState.watermark(catalog, db) <= batchId) {
            graft.operators.MomentState.applyDelta(catalog, db,
              removed = added.limit(0), added = added, d = d,
              token = batchId + 1)
            ()
          }
        }
      }
      .start()
  }

  /** The batch minus its cosine-verified near-dups (vs stored state and
    * vs smaller-id batch peers). */
  private def vectorSurvivors(
      spark: SparkSession, batch: DataFrame,
      catalog: LakeCatalog, db: String, tau: Double): DataFrame = {
    val batchBands = sigBands(batch).localCheckpoint(true)
    val stored = catalog.loadTable(db, "sigbands").get.read()
    // id-inequality, not disjointness: on crash-replay the stored side
    // may already hold THIS batch's survivors
    val cross = batchBands.as("n")
      .join(stored.as("o"), col("n.band") === col("o.band") &&
        col("n.bkey") === col("o.bkey") &&
        col("n.vec_id") =!= col("o.vec_id"))
      .select(least(col("n.vec_id"), col("o.vec_id")).as("ia"),
        greatest(col("n.vec_id"), col("o.vec_id")).as("ib"))
    val self = batchBands.as("a")
      .join(batchBands.as("b"), col("a.band") === col("b.band") &&
        col("a.bkey") === col("b.bkey") &&
        col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ia"), col("b.vec_id").as("ib"))
    val cand = cross.union(self).distinct().localCheckpoint(true)
    val allVecs = catalog.loadTable(db, "vectors").get.read()
      .unionByName(batch)
    // the !isnan guard is DEFENSE IN DEPTH: with only finite-norm
    // vectors indexed, no candidate cosine can be NaN — but state
    // provisioned before that rule (or hand-built) may hold indexed
    // zero vectors, and NaN >= tau is TRUE under Spark's ordering, so
    // without the guard one such row would "verify" and drop innocents
    val cos = graft.functions.VectorOps.cosine(col("va"), col("vb"))
    val verified = graft.operators.VectorJoin
      .attachPair(cand, allVecs, "vec_id", "v")
      .filter(!isnan(cos) && cos >= tau)
      .select("ia", "ib")
    val bIds = batch.select(col("vec_id"))
    val aNew = bIds.select(col("vec_id").as("ia"), lit(true).as("a_new"))
    val bNew = bIds.select(col("vec_id").as("ib"), lit(true).as("b_new"))
    val drops = verified
      .join(broadcast(aNew), Seq("ia"), "left")
      .join(broadcast(bNew), Seq("ib"), "left")
      .select(
        when(col("a_new").isNotNull && col("b_new").isNotNull,
          greatest(col("ia"), col("ib")))
          .when(col("a_new").isNotNull, col("ia"))
          .otherwise(col("ib")).as("vec_id"))
      .distinct()
    batch.join(broadcast(drops), Seq("vec_id"), "left_anti")
  }
}
