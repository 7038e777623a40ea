package graft.lake

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalacheck.{Gen, rng}

import graft.SparkSpec

/** M36 hidden partitioning: partition transforms (bucket / truncate /
  * years / months / days / hours) — write-side rendering, the three-way
  * render agreement (dispatcher write, DML writer, prune literal), and
  * transform-aware metadata pruning including the new range pruning.
  *
  * The load-bearing invariant: PRUNED READ ≡ FULL READ + FILTER for any
  * predicate, while a selective predicate provably drops files (asserted
  * by vaporizing the excluded files from disk — if pruning ever admits
  * one, the scan fails loudly on the missing file). */
class PartitionTransformSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("ts", TimestampType),
    StructField("amount", DoubleType)))

  private def freshCatalog(): LakeCatalog = {
    val wh = Files.createTempDirectory("graft-pt-wh")
    var t = 1700000000000L
    new LakeCatalog(spark, wh, () => { t += 1000; t })
  }

  private def ts(s: String): Timestamp =
    Timestamp.from(java.time.Instant.parse(s))

  private def df(rows: Seq[(Long, String, Timestamp, Double)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, n, t, a) => Row(i, n, t, a) }, 2),
      schema)

  private val fixture = Seq(
    (1L, "alpha", ts("2026-01-05T03:00:00Z"), 10.0),
    (2L, "alps", ts("2026-01-20T13:00:00Z"), 20.0),
    (3L, "beta", ts("2026-02-01T00:30:00Z"), 30.0),
    (4L, "bet", ts("2026-02-15T23:00:00Z"), 40.0),
    (5L, "gamma", ts("2026-03-31T12:00:00Z"), 50.0),
    (6L, "gamut", ts("2026-04-01T00:00:00Z"), 60.0),
    (7L, "alpha", ts("2026-01-05T03:59:00Z"), 70.0),
    (8L, "delta", ts("2026-12-31T23:59:59Z"), 80.0))

  // ------------------------------------------------------------ parsing

  test("parse: validation catches bad specs at DDL time") {
    intercept[IllegalArgumentException] {
      PartitionTransform.parseAll(Seq("nope"), schema)
    }
    intercept[IllegalArgumentException] { // amount is DOUBLE
      PartitionTransform.parseAll(Seq("truncate(3,amount)"), schema)
    }
    intercept[IllegalArgumentException] { // hours over DATE unsupported
      PartitionTransform.parseAll(Seq("hours(d)"),
        StructType(Seq(StructField("d", DateType))))
    }
    intercept[IllegalArgumentException] { // duplicate field names
      PartitionTransform.parseAll(Seq("days(ts)", "days(ts)"), schema)
    }
    intercept[IllegalArgumentException] { // field collides with a column
      PartitionTransform.parseAll(Seq("days(ts)"),
        StructType(schema.fields :+ StructField("ts_day", StringType)))
    }
    // happy path round-trips the canonical spec strings
    val ts2 = PartitionTransform.parseAll(
      Seq("bucket(8,id)", "truncate(3,name)", "months(ts)"), schema)
    assert(ts2.map(_.spec) ==
      Seq("bucket(8,id)", "truncate(3,name)", "months(ts)"))
    assert(ts2.map(_.fieldName) == Seq("id_bucket_8", "name_trunc_3", "ts_month"))
  }

  // -------------------------------------------- write-side rendering

  test("write records transformed partition values that match row content") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "w", schema,
      Seq("months(ts)", "bucket(4,id)")).append(df(fixture))

    val monthOf = fixture.map { case (i, _, tstamp, _) =>
      i -> tstamp.toInstant.atZone(java.time.ZoneOffset.UTC)
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM"))
    }.toMap

    // every file's recorded values agree with the transform of every row
    // it actually contains (read each file back individually)
    t.dataFiles.foreach { f =>
      val pvMonth = f.partitionValues("ts_month")
      val pvBucket = f.partitionValues("id_bucket_4").toLong
      val rows = spark.read.schema(schema).parquet(f.path).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(monthOf(r.getLong(0)) == pvMonth)
      }
      // bucket agreement via the engine's own xxhash64
      val ids = rows.map(_.getLong(0))
      val buckets = spark.range(1).select(
        ids.map(i => pmod(xxhash64(lit(i)), lit(4L)).cast("long")): _*)
        .head().toSeq.map(_.asInstanceOf[Long])
      buckets.foreach(b => assert(b == pvBucket))
    }
    // months Jan/Feb/Mar/Apr/Dec × up to 4 buckets
    assert(t.dataFiles.flatMap(_.partitionValues.get("ts_month")).toSet ==
      Set("2026-01", "2026-02", "2026-03", "2026-04", "2026-12"))
  }

  test("hive-path roundtrip for truncate prefixes with URL-hostile chars") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val rows = Seq(
      (1L, "a b c", ts("2026-01-01T00:00:00Z"), 1.0),
      (2L, "a+b+c", ts("2026-01-01T00:00:00Z"), 2.0),
      (3L, "a/b/c", ts("2026-01-01T00:00:00Z"), 3.0),
      (4L, "x=y:z", ts("2026-01-01T00:00:00Z"), 4.0))
    val t = cat.createTable("db", "h", schema, Seq("truncate(3,name)"))
      .append(df(rows))
    assert(t.dataFiles.flatMap(_.partitionValues.get("name_trunc_3")).toSet ==
      Set("a b", "a+b", "a/b", "x=y"))
    // and pruning on the source column still lands on the right file
    val pred = PartitionPruning.predicate(t.transforms,
      Seq(org.apache.spark.sql.sources.EqualTo("name", "a+b+c")))
    val kept = t.dataFiles.filter(f => pred(f.partitionValues))
    assert(kept.size == 1 &&
      kept.head.partitionValues("name_trunc_3") == "a+b")
  }

  test("null source values land in the hive default partition (time) and a real bucket") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val rows = Seq(
      (1L, "a", ts("2026-01-01T00:00:00Z"), 1.0),
      (2L, null.asInstanceOf[String], null.asInstanceOf[Timestamp], 2.0))
    val t = cat.createTable("db", "n", schema, Seq("days(ts)"))
      .append(df(rows))
    assert(t.dataFiles.flatMap(_.partitionValues.get("ts_day")).toSet ==
      Set("2026-01-01", PartitionRender.HiveDefault))
    // the hive-default partition ALWAYS survives constraints: the token
    // is ambiguous (hive maps null AND empty-string renderings to it),
    // so pruning it would lose empty-string rows; the filter above the
    // scan refilters null rows out
    val pred = PartitionPruning.predicate(t.transforms,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(
        "ts", ts("2020-01-01T00:00:00Z"))))
    val kept = t.dataFiles.filter(f => pred(f.partitionValues))
    assert(kept.flatMap(_.partitionValues.get("ts_day")).toSet ==
      Set("2026-01-01", PartitionRender.HiveDefault))
    // … and a 2027+ bound still prunes the dated file while keeping the
    // ambiguous one
    val pred27 = PartitionPruning.predicate(t.transforms,
      Seq(org.apache.spark.sql.sources.GreaterThanOrEqual(
        "ts", ts("2027-01-01T00:00:00Z"))))
    assert(t.dataFiles.filter(f => pred27(f.partitionValues))
      .flatMap(_.partitionValues.get("ts_day")).toSet ==
      Set(PartitionRender.HiveDefault))
    // full scan still returns both rows (null row refiltered above scan
    // when the predicate allows; unconditional read sees it)
    assert(t.read().count() == 2)
  }

  // ---------------------------------------------------------- pruning

  /** Differential harness: pruned-by-metadata read ≡ full read + filter,
    * and the pruned file set is exactly verified by vaporizing excluded
    * files. */
  private def checkPrune(t: LakeTable,
      filters: Seq[org.apache.spark.sql.sources.Filter],
      dfFilter: org.apache.spark.sql.Column,
      expectPruned: Boolean = true): Unit = {
    val pred = PartitionPruning.predicate(t.transforms, filters)
    val kept = t.dataFiles.filter(f => pred(f.partitionValues))
    if (expectPruned)
      assert(kept.size < t.dataFiles.size,
        s"expected pruning for $filters over ${t.dataFiles.map(_.partitionValues)}")
    val prunedRows = t.read(partitionFilter = pred).filter(dfFilter)
      .select("id").collect().map(_.getLong(0)).toSet
    val fullRows = t.read().filter(dfFilter)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(prunedRows == fullRows, s"prune lost rows for $filters")
  }

  test("bucket pruning: point lookups keep exactly the key's bucket") {
    import org.apache.spark.sql.sources._
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "b", schema, Seq("bucket(4,id)"))
      .append(df(fixture))
    fixture.foreach { case (i, _, _, _) =>
      checkPrune(t, Seq(EqualTo("id", java.lang.Long.valueOf(i))),
        col("id") === i)
    }
    // IN-list prunes to the union of buckets
    checkPrune(t, Seq(In("id", Array[Any](
      java.lang.Long.valueOf(1L), java.lang.Long.valueOf(2L)))),
      col("id").isin(1L, 2L))
    // a range over a bucket transform must NOT prune (hash destroys order)
    val pred = PartitionPruning.predicate(t.transforms,
      Seq(GreaterThan("id", java.lang.Long.valueOf(4L))))
    assert(t.dataFiles.forall(f => pred(f.partitionValues)))
  }

  test("time-transform range pruning over months(ts)") {
    import org.apache.spark.sql.sources._
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "m", schema, Seq("months(ts)"))
      .append(df(fixture))
    // Q1 2026 window: Jan+Feb+Mar survive, Apr+Dec pruned
    val lo = ts("2026-01-01T00:00:00Z"); val hi = ts("2026-04-01T00:00:00Z")
    val pred = PartitionPruning.predicate(t.transforms,
      Seq(GreaterThanOrEqual("ts", lo), LessThan("ts", hi)))
    val kept = t.dataFiles.filter(f => pred(f.partitionValues))
      .flatMap(_.partitionValues.get("ts_month")).toSet
    // boundary month 2026-04 is KEPT by `< 2026-04-01` (partition
    // granularity can't see inside the month) — correct superset
    assert(kept == Set("2026-01", "2026-02", "2026-03", "2026-04"))
    checkPrune(t, Seq(GreaterThanOrEqual("ts", lo), LessThan("ts", hi)),
      col("ts") >= lit(lo) && col("ts") < lit(hi))
    // equality prunes to one month
    checkPrune(t, Seq(EqualTo("ts", ts("2026-02-01T00:30:00Z"))),
      col("ts") === lit(ts("2026-02-01T00:30:00Z")))
  }

  test("pruned files are provably never opened (vaporize excluded)") {
    import org.apache.spark.sql.sources._
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "v", schema, Seq("days(ts)"))
      .append(df(fixture))
    val lo = ts("2026-02-01T00:00:00Z")
    val pred = PartitionPruning.predicate(t.transforms,
      Seq(GreaterThanOrEqual("ts", lo)))
    val (kept, excluded) = t.dataFiles.partition(f => pred(f.partitionValues))
    assert(excluded.nonEmpty && kept.nonEmpty)
    excluded.foreach(f => Files.delete(java.nio.file.Paths.get(f.path)))
    // if pruning ever admitted an excluded file this scan would fail
    val got = t.read(partitionFilter = pred).filter(col("ts") >= lit(lo))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == fixture.filter(_._3.compareTo(lo) >= 0).map(_._1).toSet)
  }

  test("identity partitions gain range pruning (M36 bonus)") {
    import org.apache.spark.sql.sources._
    val cat = freshCatalog(); cat.createNamespace("db")
    val intSchema = StructType(Seq(
      StructField("id", LongType), StructField("grp", IntegerType)))
    val rows = (1L to 20L).map(i => Row(i, (i % 5).toInt))
    val t = cat.createTable("db", "ir", intSchema, Seq("grp"))
      .append(spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 2), intSchema))
    val pred = PartitionPruning.predicate(t.transforms,
      Seq(GreaterThanOrEqual("grp", java.lang.Integer.valueOf(3))))
    val kept = t.dataFiles.filter(f => pred(f.partitionValues))
      .flatMap(_.partitionValues.get("grp")).toSet
    assert(kept == Set("3", "4"))
  }

  test("empty-string partition values survive constraints (hive-default ambiguity)") {
    import org.apache.spark.sql.sources._
    val cat = freshCatalog(); cat.createNamespace("db")
    val rows = Seq(
      (1L, "", ts("2026-01-01T00:00:00Z"), 1.0),
      (2L, "zzz", ts("2026-01-01T00:00:00Z"), 2.0))
    val t = cat.createTable("db", "es", schema, Seq("name"))
      .append(df(rows))
    // hive maps the "" rendering to __HIVE_DEFAULT_PARTITION__ on disk
    assert(t.dataFiles.flatMap(_.partitionValues.get("name")).toSet ==
      Set(PartitionRender.HiveDefault, "zzz"))
    // "" satisfies name <= "a" — the ambiguous token must not be pruned
    val pred = PartitionPruning.predicate(t.transforms,
      Seq(LessThanOrEqual("name", "a")))
    val got = t.read(partitionFilter = pred).filter(col("name") <= "a")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
    // equality on "" likewise
    val predEq = PartitionPruning.predicate(t.transforms,
      Seq(EqualTo("name", "")))
    val gotEq = t.read(partitionFilter = predEq).filter(col("name") === "")
      .select("id").collect().map(_.getLong(0)).toSet
    assert(gotEq == Set(1L))
  }

  test("spec evolution changing a transform parameter never prunes old files wrongly") {
    import org.apache.spark.sql.sources._
    val cat = freshCatalog(); cat.createNamespace("db")
    val (eraA, eraB) = fixture.splitAt(4)
    val t = cat.createTable("db", "ev", schema, Seq("bucket(4,id)"))
      .append(df(eraA))
      .setPartitionSpec(Seq("bucket(8,id)"))
      .append(df(eraB))
    // the two eras record under DISTINCT field keys — old files carry no
    // id_bucket_8 value, so a mod-8 constraint conservatively keeps them
    assert(t.dataFiles.exists(_.partitionValues.contains("id_bucket_4")))
    assert(t.dataFiles.exists(_.partitionValues.contains("id_bucket_8")))
    fixture.foreach { case (i, _, _, _) =>
      val pred = PartitionPruning.predicate(t.transforms,
        Seq(EqualTo("id", java.lang.Long.valueOf(i))))
      val got = t.read(partitionFilter = pred).filter(col("id") === i)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got == Set(i), s"row $i lost across spec evolution")
    }
  }

  test("truncate floors negative integrals without narrow-type wrap") {
    import org.apache.spark.sql.sources._
    val cat = freshCatalog(); cat.createNamespace("db")
    val rows = Seq(
      (-128L, "a", ts("2026-01-01T00:00:00Z"), 1.0),
      (-5L, "b", ts("2026-01-01T00:00:00Z"), 2.0),
      (17L, "c", ts("2026-01-01T00:00:00Z"), 3.0))
    val t = cat.createTable("db", "tn", schema, Seq("truncate(10,id)"))
      .append(df(rows))
    // floor semantics: -128 → -130, -5 → -10, 17 → 10
    assert(t.dataFiles.flatMap(_.partitionValues.get("id_trunc_10")).toSet ==
      Set("-130", "-10", "10"))
    val pred = PartitionPruning.predicate(t.transforms,
      Seq(LessThanOrEqual("id", java.lang.Long.valueOf(-120L))))
    val got = t.read(partitionFilter = pred).filter(col("id") <= -120L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(-128L))
  }

  // ------------------------------------------------ property: differential

  test("property: random predicates over (days(ts), bucket(4,id)) never lose rows") {
    import org.apache.spark.sql.sources._
    val cat = freshCatalog(); cat.createNamespace("db")
    val base = java.time.Instant.parse("2026-01-01T00:00:00Z")
    val rows = (1L to 60L).map { i =>
      (i, s"n$i", Timestamp.from(base.plusSeconds(i * 7200)), i * 1.5)
    }
    val t = cat.createTable("db", "p", schema,
      Seq("days(ts)", "bucket(4,id)")).append(df(rows))
    // seeded generation (fixed seed: failures reproduce)
    val genCase = for {
      op <- Gen.oneOf("eq", "ge", "lt", "idEq")
      k <- Gen.choose(1L, 60L)
    } yield (op, k)
    val cases = Gen.listOfN(25, genCase)
      .apply(Gen.Parameters.default, rng.Seed(42L))
      .getOrElse(sys.error("ScalaCheck generator failed"))
    cases.foreach { case (op, k) =>
      val tsK = Timestamp.from(base.plusSeconds(k * 7200))
      val (filters, cond) = op match {
        case "eq" => (Seq(EqualTo("ts", tsK)), col("ts") === lit(tsK))
        case "ge" => (Seq(GreaterThanOrEqual("ts", tsK)), col("ts") >= lit(tsK))
        case "lt" => (Seq(LessThan("ts", tsK)), col("ts") < lit(tsK))
        case "idEq" => (Seq(EqualTo("id", java.lang.Long.valueOf(k))),
          col("id") === k)
      }
      val pred = PartitionPruning.predicate(t.transforms, filters)
      val pruned = t.read(partitionFilter = pred).filter(cond)
        .select("id").collect().map(_.getLong(0)).toSet
      val full = t.read().filter(cond)
        .select("id").collect().map(_.getLong(0)).toSet
      assert(pruned == full)
    }
  }

  // -------------------------------------------------- SQL + DML surface

  test("dispatcher DDL accepts transforms; native SQL prunes through them") {
    val wh = Files.createTempDirectory("graft-pt-sql-wh")
    val sql = new LakeSql(new LakeCatalog(spark, wh))
    sql.run("""CREATE TABLE db.tx (id BIGINT, name STRING, ts TIMESTAMP)
      PARTITIONED BY (months(ts), bucket(4, id))""")
    sql.run("""INSERT INTO db.tx VALUES
      (1, 'a', TIMESTAMP '2026-01-05 03:00:00'),
      (2, 'b', TIMESTAMP '2026-02-01 00:30:00'),
      (3, 'c', TIMESTAMP '2026-03-31 12:00:00')""")
    val t = sql.catalog.loadTable("db", "tx").get
    assert(t.transforms.map(_.fieldName) == Seq("ts_month", "id_bucket_4"))
    assert(t.dataFiles.flatMap(_.partitionValues.get("ts_month")).toSet ==
      Set("2026-01", "2026-02", "2026-03"))
    // native read path: vaporize everything outside Feb, query with a ts
    // range — NativeReadRule's metadata pruning must drop those files
    val feb = t.dataFiles.filter(
      _.partitionValues.get("ts_month").contains("2026-02"))
    t.dataFiles.filterNot(feb.contains).foreach(f =>
      Files.delete(java.nio.file.Paths.get(f.path)))
    // NB: an upper bound AT a month boundary (`< 2026-03-01 00:00`)
    // admits the boundary month "2026-03" — partition granularity is a
    // conservative superset — so the bound sits inside February here
    val got = spark.sql(
      """SELECT id FROM lake.db.tx
         WHERE ts >= TIMESTAMP '2026-02-01 00:00:00'
           AND ts <= TIMESTAMP '2026-02-28 23:59:59'""")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(2))
  }

  test("ALTER TABLE ADD/DROP PARTITION FIELD evolves the spec") {
    val wh = Files.createTempDirectory("graft-pt-alter-wh")
    val sql = new LakeSql(new LakeCatalog(spark, wh))
    sql.run("""CREATE TABLE db.pe (id BIGINT, ts TIMESTAMP)
               PARTITIONED BY (days(ts))""")
    sql.run("ALTER TABLE db.pe ADD PARTITION FIELD bucket(4, id)")
    assert(sql.catalog.loadTable("db", "pe").get.transforms.map(_.spec) ==
      Seq("days(ts)", "bucket(4,id)"))
    // whitespace-insensitive drop, canonical or raw spelling
    sql.run("ALTER TABLE db.pe DROP PARTITION FIELD bucket(4, id)")
    assert(sql.catalog.loadTable("db", "pe").get.transforms.map(_.spec) ==
      Seq("days(ts)"))
    intercept[Exception] {
      sql.run("ALTER TABLE db.pe DROP PARTITION FIELD months(ts)")
    }
  }

  test("native DML writers record transformed partition values") {
    val wh = Files.createTempDirectory("graft-pt-dml-wh")
    val sql = new LakeSql(new LakeCatalog(spark, wh))
    sql.run("""CREATE TABLE db.dm (id BIGINT, name STRING, ts TIMESTAMP)
      PARTITIONED BY (days(ts)) TBLPROPERTIES (
      'write.delete.mode'='merge-on-read', 'write.update.mode'='merge-on-read')""")
    sql.run("""INSERT INTO db.dm VALUES
      (1, 'a', TIMESTAMP '2026-01-05 03:00:00'),
      (2, 'b', TIMESTAMP '2026-01-06 03:00:00')""")
    val before = sql.catalog.loadTable("db", "dm").get.dataFiles.map(_.path).toSet
    // native UPDATE → delta writers split + record the days() value
    spark.sql("UPDATE lake.db.dm SET name = 'z' WHERE id = 1")
    val t = sql.catalog.loadTable("db", "dm").get
    // the DELTA-written rewrite file (not the original insert) must
    // carry the transformed value
    val fresh = t.dataFiles.filterNot(f => before.contains(f.path))
    assert(fresh.nonEmpty)
    assert(fresh.flatMap(_.partitionValues.get("ts_day")).toSet ==
      Set("2026-01-05"))
    assert(spark.sql("SELECT name FROM lake.db.dm WHERE id = 1")
      .head().getString(0) == "z")
  }
}
