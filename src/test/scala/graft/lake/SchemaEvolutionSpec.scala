package graft.lake

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
import org.apache.spark.sql.types._

import graft.SparkSpec

/** M48 metadata-only schema evolution: RENAME COLUMN and widening
  * ALTER COLUMN … TYPE. The change log replaces Iceberg's field ids —
  * per-file physical schemas derive from commit sequences, so no file
  * is rewritten by either DDL, and pruning / MoR deletes / defaults all
  * stay correct across epochs. */
class SchemaEvolutionSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("category", StringType),
    StructField("amount", DoubleType)))

  private def freshCatalog(): LakeCatalog = {
    val wh = Files.createTempDirectory("graft-evo-wh")
    var t = 1700000000000L
    new LakeCatalog(spark, wh, () => { t += 1000; t })
  }

  private def df(rows: (Int, String, Double)*): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(
        rows.map { case (i, c, a) => Row(i, c, a) }, 1),
      schema)

  private def dfAs(s: StructType, rows: Row*): DataFrame =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), s)

  private def morProps = Map(
    "write.delete.mode" -> "merge-on-read",
    "write.update.mode" -> "merge-on-read")

  test("rename is metadata-only and both epochs read under the new name") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "r1", schema).append(df((1, "a", 10.0)))
    val before = t.dataFiles.map(f =>
      f.path -> Files.getLastModifiedTime(Paths.get(f.path))).toMap
    t = t.renameColumn("category", "cat")
    // no data file touched, none added
    assert(t.dataFiles.map(_.path).toSet == before.keySet)
    t.dataFiles.foreach(f =>
      assert(Files.getLastModifiedTime(Paths.get(f.path)) == before(f.path)))
    // post-rename epoch: new file physically carries `cat`
    t = t.append(dfAs(t.schema, Row(2, "b", 20.0)))
    assert(t.schema.fieldNames.toSeq == Seq("id", "cat", "amount"))
    val got = t.read().select("id", "cat").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1, "a"), (2, "b")))
  }

  test("chained renames compose across three epochs") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "r2", schema).append(df((1, "a", 1.0)))
    t = t.renameColumn("category", "cat")
    t = t.append(dfAs(t.schema, Row(2, "b", 2.0)))
    t = t.renameColumn("cat", "kind")
    t = t.append(dfAs(t.schema, Row(3, "c", 3.0)))
    val got = t.read().select("id", "kind").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1, "a"), (2, "b"), (3, "c")))
    // reloaded handle sees the same three epochs
    val got2 = cat.loadTable("db", "r2").get.read()
      .select("id", "kind").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(got2 == got)
  }

  test("widen INT->BIGINT reads old narrow files and new wide ones") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "w1", schema).append(df((7, "a", 1.0)))
    t = t.widenColumn("id", LongType)
    assert(t.schema("id").dataType == LongType)
    t = t.append(dfAs(t.schema, Row(5000000000L, "b", 2.0)))
    val got = t.read().select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(got == Seq(7L, 5000000000L))
    // aggregate across both epochs
    assert(t.read().agg(sum("id")).collect()(0).getLong(0) == 5000000007L)
  }

  test("widen rejects narrowing and non-promotions; bucket sources refuse") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t = cat.createTable("db", "w2", schema)
    intercept[IllegalArgumentException](t.widenColumn("id", StringType))
    intercept[IllegalArgumentException](t.widenColumn("amount", FloatType))
    intercept[IllegalArgumentException](t.widenColumn("nope", LongType))
    val tb = cat.createTable("db", "w3", schema, Seq("bucket(4,id)"))
    intercept[IllegalArgumentException](tb.widenColumn("id", LongType))
  }

  test("historical names retire: re-adding or re-renaming onto them fails") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "h1", schema).append(df((1, "a", 1.0)))
    t = t.renameColumn("category", "cat")
    // the old physical name is burned — an added column would collide
    // with the pre-rename files' physical `category`
    intercept[IllegalArgumentException](t.addColumn("category", StringType))
    intercept[IllegalArgumentException](t.renameColumn("cat", "category"))
    t = t.dropColumn("amount")
    intercept[IllegalArgumentException](t.addColumn("amount", DoubleType))
    // a genuinely fresh name is fine
    t = t.addColumn("amount2", DoubleType)
    assert(t.schema.fieldNames.contains("amount2"))
  }

  test("renamed identity-partition column keeps pruning pre-rename files") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "p1", schema, Seq("category"))
      .append(df((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    t = t.renameColumn("category", "cat")
    t = t.append(dfAs(t.schema, Row(4, "b", 4.0)))
    assert(t.meta.partitionCols == Seq("cat"))
    // predicate on the NEW name must prune files from BOTH epochs
    val pruned = t.readPruned(Seq(EqualTo("cat", "b")))
    assert(pruned.inputFiles.length == 2) // one pre-rename 'b', one post
    assert(pruned.filter(col("cat") === "b").select("id").collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(2, 4))
  }

  test("renamed transform-partition source keeps pruning (days(ts) epoch keys)") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val s = StructType(Seq(
      StructField("id", IntegerType), StructField("ts", DateType)))
    def d(x: String) = java.sql.Date.valueOf(x)
    var t = cat.createTable("db", "p2", s, Seq("days(ts)"))
      .append(dfAs(s, Row(1, d("2024-01-01")), Row(2, d("2024-01-02"))))
    t = t.renameColumn("ts", "event_ts")
    t = t.append(dfAs(t.schema, Row(3, d("2024-01-02"))))
    val pruned = t.readPruned(Seq(EqualTo("event_ts", d("2024-01-02"))))
    assert(pruned.inputFiles.length == 2) // the 01-02 file of each epoch
    assert(pruned.filter(col("event_ts") === d("2024-01-02"))
      .select("id").collect().map(_.getInt(0)).sorted.toSeq == Seq(2, 3))
  }

  test("footer-stats skipping fires across a rename and a widen") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "s1", schema)
      .append(df((1, "a", 1.0))).append(df((100, "b", 2.0)))
    t = t.renameColumn("id", "doc")
    t = t.widenColumn("doc", LongType)
    // old files recorded stats under `id` as INT; the lifted key + wide
    // parse must still skip the low file
    val pruned = t.readPruned(Seq(GreaterThan("doc", Long.box(50L))))
    assert(pruned.inputFiles.length == 1)
    assert(pruned.filter(col("doc") > 50L).select("doc").collect()
      .map(_.getLong(0)).toSeq == Seq(100L))
  }

  test("MoR position deletes and equality upserts survive a rename") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "m1", schema, props = morProps)
      .append(df((1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)))
    t = t.delete(col("id") === 2) // position delete, pre-rename
    t = t.upsertByKey(df((3, "c2", 3.5), (4, "d", 4.0)), Seq("id")) // equality
    t = t.renameColumn("category", "cat").renameColumn("id", "doc")
    val got = t.read().select("doc", "cat").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1, "a"), (3, "c2"), (4, "d")))
    // an equality upsert AFTER the rename still composes with the old one
    t = t.upsertByKey(
      dfAs(t.schema, Row(4, "d2", 4.5)), Seq("doc"))
    val got2 = t.read().select("doc", "cat").collect()
      .map(r => (r.getInt(0), r.getString(1))).sorted.toSeq
    assert(got2 == Seq((1, "a"), (3, "c2"), (4, "d2")))
  }

  test("initial-defaults follow the renamed column") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "d1", schema).append(df((1, "a", 1.0)))
    t = t.addColumn("score", IntegerType, default = Some("42"))
    t = t.renameColumn("score", "quality")
    t = t.append(dfAs(t.schema, Row(2, "b", 2.0, 7)))
    val got = t.read().select("id", "quality").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted.toSeq
    assert(got == Seq((1, 42), (2, 7)))
  }

  test("compaction materializes the current epoch physically") {
    val cat = freshCatalog(); cat.createNamespace("db")
    var t = cat.createTable("db", "c1", schema).append(df((1, "a", 1.0)))
    t = t.renameColumn("category", "cat").widenColumn("id", LongType)
    t = t.append(dfAs(t.schema, Row(2L, "b", 2.0)))
    t = Procedures.rewriteDataFiles(t, Map("rewrite-all" -> "true")).table
    // rewritten files physically carry (cat, BIGINT id): their parquet
    // schema must need no epoch translation
    val phys = spark.read.parquet(t.dataFiles.map(_.path): _*).schema
    assert(phys("cat").dataType == StringType)
    assert(phys("id").dataType == LongType)
    val got = t.read().select("id", "cat").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == Seq((1L, "a"), (2L, "b")))
  }

  test("stale-handle append after a rename refuses to rebase") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val t0 = cat.createTable("db", "f1", schema).append(df((1, "a", 1.0)))
    val stale = cat.loadTable("db", "f1").get
    t0.renameColumn("category", "cat")
    intercept[CommitConflictException](stale.append(df((2, "b", 2.0))))
  }

  test("dispatcher SQL: RENAME COLUMN and ALTER COLUMN TYPE") {
    val cat = freshCatalog(); cat.createNamespace("db")
    val sql = new LakeSql(cat)
    cat.createTable("db", "q1", schema).append(df((1, "a", 1.0)))
    sql.run("ALTER TABLE db.q1 RENAME COLUMN category TO cat")
    sql.run("ALTER TABLE db.q1 ALTER COLUMN id TYPE BIGINT")
    val t = cat.loadTable("db", "q1").get
    assert(t.schema.fieldNames.toSeq == Seq("id", "cat", "amount"))
    assert(t.schema("id").dataType == LongType)
    assert(t.read().select("id").collect().map(_.getLong(0)).toSeq == Seq(1L))
    intercept[Exception](
      sql.run("ALTER TABLE db.q1 ALTER COLUMN cat TYPE not_a_type"))
  }

  test("seeded fuzz: random DML interleaved with renames/widen ≡ model") {
    for (trial <- 0 until 2) {
      val rnd = new scala.util.Random(1234 + trial)
      val mor = trial % 2 == 0
      val cat = freshCatalog(); cat.createNamespace("db")
      val props = if (mor) morProps else Map.empty[String, String]
      var t = cat.createTable("db", "fz", schema, Seq("category"), props)
      // live column names drift as renames land; the model tracks them
      var idCol = "id"; var amtCol = "amount"; var renames = 0
      var widened = false
      var model = Vector.empty[(Long, String, Double)]
      var nextId = 0
      def insertDf(rows: Seq[(Long, String, Double)]) = {
        val s = StructType(Seq(
          StructField(idCol, if (widened) LongType else IntegerType),
          StructField("category", StringType),
          StructField(amtCol, DoubleType)))
        spark.createDataFrame(spark.sparkContext.parallelize(rows.map {
          case (i, c, a) =>
            Row(if (widened) i else i.toInt, c, a)
        }, 1), s)
      }
      def observed(): Seq[(Long, String, Double)] =
        t.read().select(idCol, "category", amtCol).collect().map(r =>
          (r.get(0).asInstanceOf[Number].longValue(), r.getString(1),
            r.getDouble(2))).toSeq.sorted
      for (step <- 0 until 14) {
        rnd.nextInt(6) match {
          case 0 | 1 => // insert
            val rows = (0 until 1 + rnd.nextInt(3)).map { _ =>
              nextId += 1
              (nextId.toLong, Seq("a", "b", "c")(rnd.nextInt(3)),
                (rnd.nextInt(1000) + 1).toDouble)
            }
            t = t.append(insertDf(rows))
            model = model ++ rows
          case 2 => // delete by id threshold through the CURRENT name
            val cut = 1 + rnd.nextInt(math.max(nextId, 1))
            t = t.delete(col(idCol) <= cut)
            model = model.filterNot(_._1 <= cut)
          case 3 => // rename id or amount to a fresh name
            renames += 1
            if (rnd.nextBoolean()) {
              val to = s"id_$renames"; t = t.renameColumn(idCol, to); idCol = to
            } else {
              val to = s"amt_$renames"; t = t.renameColumn(amtCol, to); amtCol = to
            }
          case 4 => // widen id once (INT → BIGINT), later inserts stay long
            if (!widened) { t = t.widenColumn(idCol, LongType); widened = true }
            else { // otherwise: update through the current names
              t = t.update(
                Map(amtCol -> (col(amtCol) + 1000.0)), col("category") === "a")
              model = model.map(r =>
                if (r._2 == "a") r.copy(_3 = r._3 + 1000.0) else r)
            }
          case 5 => // compaction materializes the current epoch mid-stream
            t = Procedures.rewriteDataFiles(t, Map("rewrite-all" -> "true")).table
        }
        assert(observed() == model.sorted,
          s"trial=$trial mor=$mor step=$step: table != model " +
            s"(idCol=$idCol amtCol=$amtCol widened=$widened)")
      }
      // end-state invariances: compact + reload + time-travel consistency
      t = Procedures.rewriteDataFiles(t, Map("rewrite-all" -> "true")).table
      assert(observed() == model.sorted, s"trial=$trial: compact changed state")
      t = cat.loadTable("db", "fz").get
      assert(observed() == model.sorted, s"trial=$trial: reload changed state")
    }
  }

  test("native SQL: ALTER TABLE lake.db.t RENAME COLUMN / widen, then scan") {
    freshCatalog() // points spark.graft.warehouse at a fresh root
    spark.sql("CREATE TABLE lake.db.n1 (id INT, category STRING)")
    spark.sql("INSERT INTO lake.db.n1 VALUES (1, 'a')")
    spark.sql("ALTER TABLE lake.db.n1 RENAME COLUMN category TO cat")
    spark.sql("ALTER TABLE lake.db.n1 ALTER COLUMN id TYPE BIGINT")
    spark.sql("INSERT INTO lake.db.n1 VALUES (CAST(5000000000 AS BIGINT), 'b')")
    val got = spark.sql("SELECT id, cat FROM lake.db.n1 ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "a"), (5000000000L, "b")))
  }
}
