package graft.lake

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.types._

import graft.SparkSpec

/** M50 table statistics: the ANALYZE procedure (HLL NDV + exact nulls +
  * value lengths, one pass, one commit), the SHOW STATS surface, and the
  * planner hook — accurate size/row estimates from file metadata so a
  * small lake table auto-broadcasts at plan time. */
class TableStatsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("category", StringType),
    StructField("amount", DoubleType)))

  private def fresh(): (LakeCatalog, LakeSql) = {
    val wh = Files.createTempDirectory("graft-stats-wh")
    var t = 1700000000000L
    val cat = new LakeCatalog(spark, wh, () => { t += 1000; t })
    (cat, new LakeSql(cat))
  }

  private def df(rows: (Int, String, Double)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, c, a) => Row(i, c, a) }, 2),
      schema)

  test("analyze computes row count, NDV, nulls and lengths in one pass") {
    val (cat, _) = fresh(); cat.createNamespace("db")
    val rows = (1 to 500).map(i => (i, s"cat_${i % 7}", i / 10.0))
    var t = cat.createTable("db", "a1", schema).append(df(rows: _*))
    t = t.append(spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(501, null, null)), 1), schema))
    t = Procedures.analyzeTable(t)
    val ts = t.meta.tableStats.get
    assert(ts.rowCount == 501)
    assert(ts.snapshotId == t.currentSnapshot.get.id)
    val byCol = ts.columns.map(c => c.col -> c).toMap
    assert(byCol("id").nulls == 0)
    assert(byCol("category").nulls == 1)
    assert(byCol("amount").nulls == 1)
    // HLL error is a few percent at 501 distincts; 7 categories exact-ish
    assert(math.abs(byCol("id").ndv - 501) <= 30)
    assert(math.abs(byCol("category").ndv - 7) <= 1)
    assert(byCol("category").maxLen == 5) // "cat_N"
    assert(byCol("id").avgLen == 4) // fixed-width INT
    // stats survive a reload (they are table metadata)
    val re = cat.loadTable("db", "a1").get
    assert(re.meta.tableStats.get.rowCount == 501)
  }

  test("analyze scopes to named columns and rejects unknown/complex ones") {
    val (cat, _) = fresh(); cat.createNamespace("db")
    var t = cat.createTable("db", "a2", schema).append(df((1, "a", 1.0)))
    t = Procedures.analyzeTable(t, Seq("id"))
    assert(t.meta.tableStats.get.columns.map(_.col) == Seq("id"))
    intercept[IllegalArgumentException](Procedures.analyzeTable(t, Seq("nope")))
  }

  test("CALL analyze_table + SHOW STATS on the dispatcher") {
    val (cat, sql) = fresh(); cat.createNamespace("db")
    cat.createTable("db", "a3", schema)
      .append(df((1, "a", 1.0), (2, "b", 2.0), (3, "a", 3.0)))
    // no stats yet → loud pointer at the procedure
    val e = intercept[SqlParseException](sql.run("SHOW STATS FOR db.a3"))
    assert(e.getMessage.contains("analyze_table"))
    val r = sql.run("CALL analyze_table(table => 'db.a3')").head()
    assert(r.getInt(0) == 3 && r.getLong(1) == 3L)
    val stats = sql.run("SHOW STATS FOR db.a3").collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(stats("category") == 2L) // exact at this scale
    assert(stats.contains("(table)"))
    // column scoping through the CALL surface
    sql.run("CALL analyze_table(table => 'db.a3', columns => 'id')")
    assert(sql.run("SHOW STATS FOR db.a3").collect().length == 2) // id + (table)
  }

  test("native CALL lake.system.analyze_table") {
    val (cat, _) = fresh(); cat.createNamespace("db")
    cat.createTable("db", "a4", schema).append(df((1, "a", 1.0), (2, "b", 2.0)))
    val r = spark.sql(
      "CALL lake.system.analyze_table(table => 'db.a4')").head()
    assert(r.getInt(0) == 3 && r.getLong(1) == 2L)
    assert(cat.loadTable("db", "a4").get.meta.tableStats.isDefined)
  }

  test("planner sees real sizes: small lake table auto-broadcasts") {
    val (cat, sql) = fresh(); cat.createNamespace("db")
    val dim = (1 to 10).map(i => (i, s"d$i", i.toDouble))
    val fact = (1 to 5000).map(i => (i % 10 + 1, s"f$i", i.toDouble))
    cat.createTable("db", "dim", schema).append(df(dim: _*))
    cat.createTable("db", "fact", schema).append(df(fact: _*))
    val joined = spark.sql(
      """SELECT f.id, d.category FROM lake.db.fact f
         JOIN lake.db.dim d ON f.id = d.id""")
    // plan-time decision (pre-AQE): the KB-sized dim side must broadcast,
    // which requires the scan to report its true size instead of the V1
    // bridge default (= "unknown", never broadcast)
    val plan = joined.queryExecution.sparkPlan
    assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
      s"expected BroadcastHashJoin in:\n$plan")
    assert(joined.count() == 5000)
  }

  test("ANALYZE flips the join strategy: NDV-driven filter selectivity " +
    "turns a sort-merge join into a broadcast under CBO") {
    val (cat, _) = fresh(); cat.createNamespace("db")
    // both sides are MB-scale — far above the broadcast threshold on raw
    // file size, so WITHOUT column stats the equality filter estimates
    // selectivity 1.0 and the join plans as SortMergeJoin. ANALYZE gives
    // the CBO NDV(id) ≈ 2000, the filter estimate collapses to ~rows/NDV
    // ≈ 15, and the filtered side drops under the threshold → broadcast.
    // md5 payloads defeat parquet compression so file size stays honest.
    val n = 30000
    val wide = spark.range(0, n).selectExpr(
      "CAST(id % 2000 AS INT) AS id", "md5(CAST(id AS STRING)) AS category",
      "CAST(id AS DOUBLE) AS amount")
    val other = spark.range(0, n).selectExpr(
      "CAST(id AS INT) AS id", "md5(CAST(id + 7 AS STRING)) AS category",
      "CAST(id AS DOUBLE) AS amount")
    cat.createTable("db", "cf", schema).append(wide)
    cat.createTable("db", "co", schema).append(other)
    // the splice serves plain current-state reads from the parquet plan;
    // VERSION AS OF pins the scan to the DSv2 bridge, whose
    // estimateStatistics is the stats surface under test
    val sf = cat.loadTable("db", "cf").get.currentSnapshot.get.id
    val so = cat.loadTable("db", "co").get.currentSnapshot.get.id
    def query() = spark.sql(
      s"""SELECT f.category, o.category AS oc
          FROM (SELECT * FROM lake.db.cf VERSION AS OF $sf WHERE id = 42) f
          JOIN lake.db.co VERSION AS OF $so o ON f.id = o.id""")
    def joins(p: org.apache.spark.sql.execution.SparkPlan) =
      (p.collect { case b: BroadcastHashJoinExec => "broadcast" } ++
        p.collect {
          case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            "sortmerge"
        }).toSet
    val confs = Seq("spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> (128 * 1024).toString)
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      assert(joins(query().queryExecution.sparkPlan) == Set("sortmerge"),
        "without column stats the MB-scale sides must sort-merge")
      Procedures.analyzeTable(cat.loadTable("db", "cf").get)
      val after = query()
      assert(joins(after.queryExecution.sparkPlan) == Set("broadcast"),
        s"ANALYZE must flip to broadcast:\n${after.queryExecution.sparkPlan}")
      assert(after.count() == 15) // 30000 rows / 2000 ids = 15 matches
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("row estimate subtracts MoR deletes and follows pushed filters") {
    val (cat, _) = fresh(); cat.createNamespace("db")
    val mor = Map("write.delete.mode" -> "merge-on-read",
      "write.update.mode" -> "merge-on-read")
    var t = cat.createTable("db", "a5", schema, props = mor)
      .append(df((1 to 100).map(i => (i, s"c${i % 3}", i.toDouble)): _*))
    t = t.delete(org.apache.spark.sql.functions.col("id") <= 20)
    // the native SELECT plan is a NativeReadRule splice (parquet-scan
    // stats), so probe the DSv2 estimate the V1-bridge path reports —
    // it's what plans the broadcast when the splice is ineligible
    val scan = new LakeV2Table(t)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
      .build().asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
    val est = scan.estimateStatistics()
    // 100 rows - 20 position-deleted
    assert(est.numRows().getAsLong == 80L)
    assert(est.sizeInBytes().getAsLong > 0L)
    // ANALYZE's column stats ride the same estimate for the CBO
    t = Procedures.analyzeTable(t)
    val scan2 = new LakeV2Table(t)
      .newScanBuilder(new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Collections.emptyMap()))
      .build().asInstanceOf[
        org.apache.spark.sql.connector.read.SupportsReportStatistics]
    val cs = scan2.estimateStatistics().columnStats()
    assert(!cs.isEmpty)
    val catStats = cs.entrySet().iterator().next()
    assert(catStats.getValue.nullCount().isPresent)
  }
}
