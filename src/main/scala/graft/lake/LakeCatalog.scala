package graft.lake

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Catalog entry projection (S5/P7) — the same fields the reference
  * extracts from a Glue table record
  * (/root/reference/internal/upgrade_table.py:47-54). `formatVersion` is a
  * string because the reference models it that way ("2" | "3" |
  * "UNKNOWN", upgrade_table.py:52). */
final case class TableInfo(
    name: String,
    database: String,
    location: String,
    tableType: String,
    formatVersion: String,
    metadataLocation: String)

/** Filesystem-backed catalog under a warehouse root — the Spark-native
  * restatement of the reference's Glue catalog layer
  * (/root/reference/internal/create_demo_table.py:41-65,
  * upgrade_table.py:33-56,149-170).
  *
  * Layout: `warehouse/<db>/` is a namespace; `warehouse/<db>/<table>/`
  * holds table data plus `metadata/` (lake tables) or `foreign.json`
  * (non-lake entries that the upgrade driver must skip — modeling the
  * `table_type != 'ICEBERG'` Glue records). Catalog operations are
  * metadata-scale: directory listings and small JSON reads, never Spark
  * jobs.
  */
class LakeCatalog(
    val spark: SparkSession,
    val warehouse: Path,
    clock: () => Long = () => System.currentTimeMillis()) {

  import LakeCatalog._

  // ------------------------------------------------------------ namespaces

  /** Idempotent namespace provisioning (S7) — the reference tolerates
    * AlreadyExists on both bucket and database creation
    * (create_demo_table.py:24-31,58-63). */
  def createNamespace(db: String): Unit = {
    requireValidName(db)
    Files.createDirectories(warehouse.resolve(db))
  }

  def namespaceExists(db: String): Boolean =
    Files.isDirectory(warehouse.resolve(db))

  def listNamespaces(): Seq[String] = listDirs(warehouse)

  // ---------------------------------------------------------------- tables

  def tableLocation(db: String, table: String): Path =
    warehouse.resolve(db).resolve(table)

  def tableExists(db: String, table: String): Boolean = {
    val loc = tableLocation(db, table)
    Meta.currentVersion(loc).isDefined || Files.exists(loc.resolve(ForeignFile))
  }

  /** CREATE TABLE (S2): persists schema, identity partition spec and
    * props; `format-version` prop selects v2/v3
    * (create_demo_table.py:102-114). */
  def createTable(
      db: String,
      table: String,
      schema: StructType,
      partitionBy: Seq[String] = Nil,
      props: Map[String, String] = Map.empty): LakeTable = {
    requireValidName(db); requireValidName(table)
    if (!namespaceExists(db))
      throw new IllegalArgumentException(s"namespace $db does not exist")
    if (tableExists(db, table))
      throw new IllegalArgumentException(s"table $db.$table already exists")
    if (viewExists(db, table))
      throw new IllegalArgumentException(
        s"$db.$table already exists as a view")
    // validates source columns, transform/type compatibility, and
    // partition-field collisions (M36 — specs may be transforms)
    PartitionTransform.parseAll(partitionBy, schema)
    val version = props.getOrElse("format-version", "2").toInt
    // variant is an Iceberg v3 type (M47): a v2 table carrying one would
    // be unreadable by every v2 reader — reject with the upgrade hint
    // rather than producing a corrupt-to-others table
    if (version < 3) LakeTable.requireNoVariant(schema, s"$db.$table", version)
    val m = TableMetadata(
      name = s"$db.$table",
      formatVersion = version,
      schemaDdl = schema.toDDL,
      partitionCols = partitionBy,
      props = props,
      // v3 tables are born with row lineage; v2 mints on upgrade (M1)
      nextRowId = if (version >= 3) 0L else -1L)
    val loc = tableLocation(db, table)
    Files.createDirectories(loc)
    Meta.commit(loc, m)
    new LakeTable(spark, loc, m, clock, loadedVersion = Some(1))
  }

  /** DROP TABLE [IF EXISTS] (S3): removes data, metadata and the catalog
    * entry; idempotent when `ifExists` (create_demo_table.py:99). */
  def dropTable(db: String, table: String, ifExists: Boolean = true): Boolean = {
    val loc = tableLocation(db, table)
    if (!tableExists(db, table)) {
      if (ifExists) return false
      throw new IllegalArgumentException(s"table $db.$table does not exist")
    }
    LakeTable.deleteRecursively(loc)
    true
  }

  /** Load the current state of a lake table (S5). */
  def loadTable(db: String, table: String): Option[LakeTable] = {
    val loc = tableLocation(db, table)
    val v = Meta.currentVersion(loc)
    Meta.load(loc).map(m => new LakeTable(spark, loc, m, clock, v))
  }

  /** Register a non-lake catalog entry — models the Glue records with
    * `table_type != 'ICEBERG'` that the upgrade driver skips
    * (upgrade_table.py:117-119,164). */
  def registerForeignTable(db: String, table: String, tableType: String): Unit = {
    requireValidName(db); requireValidName(table)
    if (!namespaceExists(db))
      throw new IllegalArgumentException(s"namespace $db does not exist")
    val loc = tableLocation(db, table)
    Files.createDirectories(loc)
    Files.write(loc.resolve(ForeignFile),
      s"""{"name": "$table", "tableType": "$tableType"}"""
        .getBytes(StandardCharsets.UTF_8))
  }

  /** Table-info lookup (S5): None for missing tables, like
    * `get_table_info` returning None on EntityNotFound
    * (upgrade_table.py:55-56). */
  def tableInfo(db: String, table: String): Option[TableInfo] = {
    val loc = tableLocation(db, table)
    Meta.currentVersion(loc) match {
      case Some(v) =>
        // header-only: a listing projection must not read manifests
        Meta.loadHeaders(loc).map { m =>
          TableInfo(table, db, loc.toString, m.tableType,
            m.formatVersion.toString,
            Meta.metadataDir(loc).resolve(s"v$v.metadata.json").toString)
        }
      case None =>
        val foreign = loc.resolve(ForeignFile)
        if (!Files.exists(foreign)) None
        else {
          val txt = new String(Files.readAllBytes(foreign), StandardCharsets.UTF_8)
          val tpe = "\"tableType\"\\s*:\\s*\"([^\"]*)\"".r
            .findFirstMatchIn(txt).map(_.group(1)).getOrElse("UNKNOWN")
          Some(TableInfo(table, db, loc.toString, tpe, "UNKNOWN", ""))
        }
    }
  }

  /** Catalog listing (S6): every entry in the namespace, for the caller to
    * filter client-side (P6) — mirrors `list_tables_in_database`
    * projecting (name, format_version) over paginated Glue results
    * (upgrade_table.py:149-170). */
  def listTables(db: String): Seq[TableInfo] =
    listDirs(warehouse.resolve(db)).sorted.flatMap(t => tableInfo(db, t))

  // ----------------------------------------------------------------- views

  /** CREATE [OR REPLACE] VIEW (M49): a view is ONE small JSON document
    * under `db/.views/` — named SQL text plus the schema captured at
    * definition time (Iceberg's view spec stores exactly this pair per
    * version). Views are late-binding: readers re-run the stored text,
    * so they track underlying-table DML and schema evolution the way
    * Iceberg/Trino views do. The dot-prefixed directory can never
    * collide with a table (table names validate as word characters). */
  def createView(db: String, name: String, vm: ViewMetadata,
      orReplace: Boolean = false): Unit = {
    requireValidName(db); requireValidName(name)
    if (!namespaceExists(db))
      throw new IllegalArgumentException(s"namespace $db does not exist")
    if (tableExists(db, name))
      throw new IllegalArgumentException(
        s"$db.$name already exists as a table")
    val dir = warehouse.resolve(db).resolve(ViewsDir)
    Files.createDirectories(dir)
    val target = dir.resolve(s"$name.json")
    if (!orReplace && Files.exists(target))
      throw new IllegalArgumentException(s"view $db.$name already exists")
    val bytes = viewMapper.writeValueAsString(vm)
      .getBytes(StandardCharsets.UTF_8)
    // atomic publish — a concurrent reader sees old or new, never torn
    val tmp = dir.resolve(s".$name.${java.util.UUID.randomUUID()}.tmp")
    Files.write(tmp, bytes)
    Files.move(tmp, target, java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  def viewInfo(db: String, name: String): Option[ViewMetadata] = {
    val f = warehouse.resolve(db).resolve(ViewsDir).resolve(s"$name.json")
    if (!Files.isRegularFile(f)) None
    else Some(viewMapper.readValue(
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8),
      classOf[ViewMetadata]))
  }

  def viewExists(db: String, name: String): Boolean =
    Files.isRegularFile(
      warehouse.resolve(db).resolve(ViewsDir).resolve(s"$name.json"))

  def listViews(db: String): Seq[String] = {
    val dir = warehouse.resolve(db).resolve(ViewsDir)
    if (!Files.isDirectory(dir)) return Nil
    val s = Files.list(dir)
    try s.iterator().asScala.map(_.getFileName.toString)
      .filter(n => n.endsWith(".json") && !n.startsWith("."))
      .map(_.stripSuffix(".json")).toList.sorted
    finally s.close()
  }

  def dropView(db: String, name: String, ifExists: Boolean = true): Boolean = {
    val f = warehouse.resolve(db).resolve(ViewsDir).resolve(s"$name.json")
    if (!Files.isRegularFile(f)) {
      if (ifExists) return false
      throw new IllegalArgumentException(s"view $db.$name does not exist")
    }
    Files.deleteIfExists(f)
  }

  // ---------------------------------------------------------------- grants

  /** Idempotent grant (M10): granting an already-held permission is a
    * no-op, like the reference tolerating AlreadyExistsException
    * (lake_formation_setup.py:48-49). */
  def grant(db: String, table: String, principal: String, perms: Seq[String]): Unit =
    withTableMeta(db, table) { m =>
      val cur = m.grants.getOrElse(principal, Nil)
      m.copy(grants = m.grants + (principal -> (cur ++ perms).distinct))
    }

  def revoke(db: String, table: String, principal: String, perms: Seq[String]): Unit =
    withTableMeta(db, table) { m =>
      val left = m.grants.getOrElse(principal, Nil).filterNot(perms.contains)
      m.copy(grants =
        if (left.isEmpty) m.grants - principal else m.grants + (principal -> left))
    }

  def grantsFor(db: String, table: String, principal: String): Seq[String] =
    Meta.loadHeaders(tableLocation(db, table))
      .map(_.grants.getOrElse(principal, Nil)).getOrElse(Nil)

  /** Grant/revoke are metadata-header edits; header-only load + commit
    * round-trips without touching any manifest (commit re-persists only
    * snapshots lacking a manifestPath, and loaded headers all have one). */
  private def withTableMeta(db: String, table: String)(
      f: TableMetadata => TableMetadata): Unit = {
    val loc = tableLocation(db, table)
    val v = Meta.currentVersion(loc)
    val m = Meta.loadHeaders(loc).getOrElse(
      throw new IllegalArgumentException(s"table $db.$table does not exist"))
    Meta.commit(loc, f(m), v)
  }
}

/** Persisted view document (M49). `schemaDdl` is the output schema at
  * definition time (informational — resolution is late-binding);
  * `currentCatalog`/`namespace` are the resolution context Spark's
  * native ViewCatalog contract requires. */
final case class ViewMetadata(
    name: String,
    sql: String,
    schemaDdl: String = "",
    currentCatalog: String = "lake",
    namespace: Seq[String] = Nil,
    queryColumnNames: Seq[String] = Nil,
    columnAliases: Seq[String] = Nil,
    columnComments: Seq[String] = Nil,
    props: Map[String, String] = Map.empty)

object LakeCatalog {
  private val ForeignFile = "foreign.json"
  private val ViewsDir = ".views"
  private[lake] val viewMapper = com.fasterxml.jackson.databind.json.JsonMapper
    .builder()
    .addModule(com.fasterxml.jackson.module.scala.DefaultScalaModule)
    .build()

  private def requireValidName(n: String): Unit =
    if (n.isEmpty || !n.forall(c => c.isLetterOrDigit || c == '_'))
      throw new IllegalArgumentException(s"invalid identifier: '$n'")

  private def listDirs(p: Path): Seq[String] = {
    if (!Files.isDirectory(p)) return Nil
    val s = Files.list(p)
    try s.iterator().asScala.filter(Files.isDirectory(_))
      .map(_.getFileName.toString).toList
    finally s.close()
  }
}
