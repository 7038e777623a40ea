package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextOps
import graft.lake.{LakeCatalog, LakeTable}

/** MAINTAINED BM25 inverted index (X57, r18): the lexical-search leg of
  * the standing-state family. q71 computes BM25 from raw text per run —
  * fine for a probe query, wrong as the serving shape: a production
  * keyword search reads an INDEX, and at 100 TB that index is standing
  * lake state that must follow the corpus through appends, takedowns
  * and re-crawls exactly like the dedup/ANN state (X49/X50) does.
  *
  * State: `tfpost` (w, doc_id, tf) — the inverted index, one row per
  * (document, distinct term); `lens` (doc_id, dl); `cstats` — the
  * (doc count, Σdl) cells behind avgdl, maintained by EXACT integer
  * deltas (the [[MomentState]] group-law: a retired doc subtracts the
  * very numbers it once added). df is deliberately NOT standing state:
  * a search derives it from the probe terms' posting lists (an
  * O(postings-of-terms) aggregate that is always current), so
  * maintenance has no per-term bookkeeping to drift.
  *
  * Maintenance cost is O(changed docs' tokens): retire = one equality
  * delete per table + a cstats delta; re-crawl = replaceByKey with the
  * maintenance id list as the explicit delete cover (a doc re-crawled
  * to empty text still retires its postings) + a cstats delta. The
  * standing index is never scanned to maintain it — only the changed
  * docs' `lens` rows are fetched (a key-filtered read; stats/bloom
  * skipping applies) to mint the subtraction.
  *
  * Crash-window contract: cstats and the index tables commit
  * separately, so a crash can leave avgdl computed over a corpus ±the
  * in-flight docs — every score shifts by the same saturation factor,
  * a bounded calibration wobble, never a wrong posting; a retried run
  * converges because deltas are derived from what is actually stored.
  * Concurrency contract: ONE maintenance writer per index (the nightly
  * job) — the lake's OCC rebases protect each row commit, but the
  * counter update is a read-merge-overwrite, and two concurrent
  * maintainers would lose each other's deltas; same posture as every
  * X49/X50 maintenance entry point.
  * 100 TB layout note: `tfpost` wants bucketing on `w` (M36) so a
  * search's probe-term fetch prunes to the terms' buckets instead of
  * scanning the index. */
object Bm25Index {

  private def tokens(docs: DataFrame): DataFrame =
    docs.select(col("doc_id").cast("long").as("doc_id"),
      TextOps.tokens(col("text")).as("tk"))

  private def postingsOf(docs: DataFrame): DataFrame =
    tokens(docs)
      .select(col("doc_id"), explode(col("tk")).as("w"))
      .groupBy("w", "doc_id").agg(count(lit(1)).as("tf"))

  private def lensOf(docs: DataFrame): DataFrame =
    tokens(docs).select(col("doc_id"), size(col("tk")).cast("long").as("dl"))

  /** (docs added, Σdl added) of a changed slice — one bounded action. */
  private def statsOf(lens: DataFrame): (Long, Long) = {
    val r = lens.agg(count(lit(1)), coalesce(sum("dl"), lit(0L))).head()
    (r.getLong(0), r.getLong(1))
  }

  private def writeStats(catalog: LakeCatalog, db: String,
      n: Long, sumdl: Long): LakeTable = {
    val s = catalog.loadTable(db, "cstats").get.read().sparkSession
    import s.implicits._
    catalog.loadTable(db, "cstats").get
      .overwrite(Seq(("n", n), ("sumdl", sumdl)).toDF("k", "s"))
  }

  private def readStats(catalog: LakeCatalog, db: String): (Long, Long) = {
    val m = catalog.loadTable(db, "cstats").get.read()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    (m("n"), m("sumdl"))
  }

  def provision(catalog: LakeCatalog, db: String, docs: DataFrame): Unit = {
    val mor = graft.streaming.StreamIngest.MorProps
    val tk = tokens(docs).localCheckpoint(true) // postings + lens + stats
    val lens = tk.select(col("doc_id"), size(col("tk")).cast("long").as("dl"))
      .localCheckpoint(true)
    catalog.createTable(db, "tfpost", StructType(Seq(
        StructField("w", StringType), StructField("doc_id", LongType),
        StructField("tf", LongType))), props = mor)
      .append(tk.select(col("doc_id"), explode(col("tk")).as("w"))
        .groupBy("w", "doc_id").agg(count(lit(1)).as("tf")))
    catalog.createTable(db, "lens", StructType(Seq(
        StructField("doc_id", LongType), StructField("dl", LongType))),
        props = mor)
      .append(lens)
    val (n, sumdl) = statsOf(lens)
    val s = docs.sparkSession
    import s.implicits._
    catalog.createTable(db, "cstats", StructType(Seq(
        StructField("k", StringType), StructField("s", LongType))))
      .append(Seq(("n", n), ("sumdl", sumdl)).toDF("k", "s"))
  }

  /** Nightly batch append: index rows first (the crash direction that
    * only costs briefly-unsearchable docs), then the stats delta. */
  def append(catalog: LakeCatalog, db: String, docs: DataFrame): Unit = {
    val lens = lensOf(docs).localCheckpoint(true)
    catalog.loadTable(db, "tfpost").get.append(postingsOf(docs))
    catalog.loadTable(db, "lens").get.append(lens)
    val (an, adl) = statsOf(lens)
    val (n, sumdl) = readStats(catalog, db)
    writeStats(catalog, db, n + an, sumdl + adl)
  }

  /** Takedown/retention: subtract exactly the stored contribution (the
    * changed docs' `lens` rows are fetched by key BEFORE the delete),
    * then retire the index rows. `ids`: one column `doc_id`. */
  def retire(catalog: LakeCatalog, db: String, ids: DataFrame): Unit = {
    val old = catalog.loadTable(db, "lens").get.read()
      .join(broadcast(ids.select(col("doc_id").cast("long").as("doc_id"))),
        "doc_id")
    val (rn, rdl) = statsOf(old)
    Seq("tfpost", "lens").foreach { t =>
      catalog.loadTable(db, t).get.addEqualityDeletes(ids, Seq("doc_id"))
    }
    val (n, sumdl) = readStats(catalog, db)
    writeStats(catalog, db, n - rn, sumdl - rdl)
  }

  /** Re-crawl: replace the changed docs' postings and length rows in
    * ONE commit per table (explicit key cover — an empty re-crawl still
    * retires), stats delta = −old + new. `updated`: (doc_id, text). */
  def recrawl(catalog: LakeCatalog, db: String, updated: DataFrame): Unit = {
    val ids = updated.select(col("doc_id").cast("long").as("doc_id"))
    val newLens = lensOf(updated).localCheckpoint(true)
    val old = catalog.loadTable(db, "lens").get.read()
      .join(broadcast(ids), "doc_id")
    val (on, odl) = statsOf(old)
    val (nn, ndl) = statsOf(newLens)
    catalog.loadTable(db, "tfpost").get
      .replaceByKey(postingsOf(updated), Seq("doc_id"), keys = ids)
    catalog.loadTable(db, "lens").get
      .replaceByKey(newLens, Seq("doc_id"), keys = ids)
    val (n, sumdl) = readStats(catalog, db)
    writeStats(catalog, db, n - on + nn, sumdl - odl + ndl)
  }

  /** BM25 top-k over the STANDING index (Robertson k1=1.2, b=0.75,
    * q71's exact algebraic form incl. the fixed-order per-term pivot):
    * probe-term postings fetched from the index (the filter reaches the
    * scan; production buckets `w`), df derived from those postings,
    * avgdl from the maintained exact counters. */
  def search(catalog: LakeCatalog, db: String, terms: Seq[String],
      k: Int): DataFrame = {
    val tf = catalog.loadTable(db, "tfpost").get.read()
      .filter(col("w").isin(terms: _*))
      .select(col("w"), col("doc_id"), col("tf").cast("double").as("tf"))
      .localCheckpoint(true) // df + contributions from one fetch
    val dfreq = tf.groupBy("w").agg(count(lit(1)).cast("double").as("df"))
    val lens = catalog.loadTable(db, "lens").get.read()
      .select(col("doc_id"), col("dl").cast("double").as("dl"))
    val (nL, sumdlL) = readStats(catalog, db)
    val n = lit(nL.toDouble)
    // one IEEE division of two exact integers — the same double the
    // oracle's SUM(len)::DOUBLE / COUNT(*)::DOUBLE produces
    val avgdl = lit(sumdlL.toDouble / nL.toDouble)
    val contrib = tf.join(broadcast(dfreq), "w")
      .join(lens, "doc_id")
      .select(col("doc_id"), col("w"),
        (log((n - col("df") + 0.5) / (col("df") + 0.5) + 1)
          * (col("tf") * 2.2)
          / (col("tf") + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / avgdl)))
          .as("contrib"))
    val pivot = terms.map(w =>
      coalesce(max(when(col("w") === w, col("contrib"))), lit(0.0)))
      .reduceLeft(_ + _)
    contrib.groupBy("doc_id").agg(pivot.as("s"))
      .orderBy(col("s").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("s"), 4).as("score"))
  }
}
