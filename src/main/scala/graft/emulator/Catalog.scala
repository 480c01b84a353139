package graft.emulator

import java.nio.file.{Files, Path}
import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType
import scala.jdk.CollectionConverters._

/** Snowflake object model over Spark's 2-level catalog (reference
  * `pkg/metadata/repository.go`): databases are Spark databases, Snowflake
  * schemas are metadata-only and flattened into the table name
  * (`DATABASE.SCHEMA_TABLE`, `table_naming.go:23-40`), tables are managed
  * parquet tables. Our own metadata rows (comments, column defs, schema
  * list) live in memory the way the reference keeps `_metadata_*` tables.
  *
  * Physical writes that replace table content go through a temp-parquet
  * swap (`overwriteTable`) because Spark refuses to overwrite a table from
  * a plan that reads it; mirrors the reference's write safety, where all
  * writes are serialized (`pkg/connection/manager.go:39-63`) — here a
  * per-table lock.
  */
final class Catalog(val spark: SparkSession) {
  import Catalog._

  private val databases = new ConcurrentHashMap[String, DatabaseMeta]()
  private val schemas = new ConcurrentHashMap[String, SchemaMeta]() // key db.schema
  private val tables = new ConcurrentHashMap[String, TableMeta]() // key db.schema.table
  private val fileFormats = new ConcurrentHashMap[String, FileFormatMeta]()
  private val tableLocks = new ConcurrentHashMap[String, Object]()

  private def up(s: String) = s.trim.toUpperCase(java.util.Locale.ROOT)
  private def tKey(r: TableNaming.Ref) = s"${r.database}.${r.schema}.${r.table}"

  def lockFor(r: TableNaming.Ref): Object =
    tableLocks.computeIfAbsent(tKey(r), _ => new Object)

  // ---- databases -----------------------------------------------------

  /** Create database + its PUBLIC schema (the reference auto-creates both
    * on login, `server/handlers/session.go:94-102`, `repository.go:193-232`). */
  def createDatabase(name: String, ifNotExists: Boolean = true): Unit = {
    val n = up(name)
    if (databases.containsKey(n) && !ifNotExists)
      throw SnowflakeError.alreadyExists(s"database $n already exists")
    databases.putIfAbsent(n, DatabaseMeta(n))
    schemas.putIfAbsent(s"$n.PUBLIC", SchemaMeta(n, "PUBLIC"))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$n`")
  }

  def dropDatabase(name: String, ifExists: Boolean = false): Unit = {
    val n = up(name)
    if (!databases.containsKey(n)) {
      if (ifExists) return
      throw SnowflakeError.notFound(s"database $n does not exist")
    }
    databases.remove(n)
    schemas.keySet.asScala.filter(_.startsWith(n + ".")).toSeq
      .foreach(schemas.remove)
    tables.keySet.asScala.filter(_.startsWith(n + ".")).toSeq
      .foreach(tables.remove)
    spark.sql(s"DROP DATABASE IF EXISTS `$n` CASCADE")
  }

  def listDatabases(): Seq[DatabaseMeta] =
    databases.values.asScala.toSeq.sortBy(_.name)

  def setDatabaseComment(name: String, comment: String): Unit =
    Option(databases.get(up(name))).foreach(_.comment = comment)

  // ---- schemas -------------------------------------------------------

  def createSchema(db: String, name: String, ifNotExists: Boolean = false): Unit = {
    val key = s"${up(db)}.${up(name)}"
    if (schemas.containsKey(key) && !ifNotExists)
      throw SnowflakeError.alreadyExists(s"schema $key already exists")
    createDatabase(up(db))
    schemas.putIfAbsent(key, SchemaMeta(up(db), up(name)))
  }

  def dropSchema(db: String, name: String, ifExists: Boolean = false): Unit = {
    val key = s"${up(db)}.${up(name)}"
    if (schemas.remove(key) == null && !ifExists)
      throw SnowflakeError.notFound(s"schema $key does not exist")
    tables.values.asScala
      .filter(t => t.database == up(db) && t.schema == up(name)).toSeq
      .foreach(t => dropTable(TableNaming.Ref(t.database, t.schema, t.table),
        ifExists = true))
  }

  def listSchemas(db: String): Seq[SchemaMeta] =
    schemas.values.asScala.filter(_.database == up(db)).toSeq.sortBy(_.name)

  // ---- tables --------------------------------------------------------

  def sparkTableName(r: TableNaming.Ref): String = TableNaming.sparkName(r)

  def tableExists(r: TableNaming.Ref): Boolean = tables.containsKey(tKey(r))

  def getTable(r: TableNaming.Ref): Option[TableMeta] = Option(tables.get(tKey(r)))

  /** Buckets per clustered table: fixed so appends always match the
    * existing spec; sized for local mode, a deployment would raise it. */
  val ClusterBuckets = 16

  def createTable(r: TableNaming.Ref, columns: Seq[ColumnDef],
      orReplace: Boolean = false, ifNotExists: Boolean = false,
      clusterKey: Option[String] = None): Unit = {
    if (tableExists(r)) {
      if (ifNotExists) return
      if (!orReplace) throw SnowflakeError.alreadyExists(
        s"table ${r.database}.${r.schema}.${r.table} already exists")
    }
    createDatabase(r.database)
    createSchema(r.database, r.schema, ifNotExists = true)
    val struct = StructType(columns.map(c =>
      org.apache.spark.sql.types.StructField(
        c.name, TypeMapper.toSparkType(c.snowflakeType), c.nullable)))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], struct)
    write(empty, clusterKey).mode(SaveMode.Overwrite)
      .saveAsTable(sparkTableName(r))
    tables.put(tKey(r), TableMeta(r.database, r.schema, r.table, "BASE TABLE",
      columns, clusterKey = clusterKey))
  }

  /** Snowflake CLUSTER BY -> Spark bucketed table: joins/aggregations on
    * the cluster key between co-clustered tables read pre-partitioned data
    * and skip the shuffle entirely — the physical meaning clustering has in
    * Snowflake, expressed in Spark's storage layer. */
  private def write(df: DataFrame, clusterKey: Option[String]) =
    clusterKey match {
      case Some(k) =>
        df.write.format("parquet").bucketBy(ClusterBuckets, k).sortBy(k)
      case None => df.write.format("parquet")
    }

  /** Register a table created via raw SQL pass-through (CTAS etc.), reading
    * the column defs back from the physical table. */
  def registerExisting(r: TableNaming.Ref): Unit = {
    val df = spark.table(sparkTableName(r))
    val cols = df.schema.fields.toSeq.map(f =>
      ColumnDef(up(f.name), TypeMapper.toSnowflakeTypeName(f.dataType), f.nullable))
    createDatabase(r.database)
    createSchema(r.database, r.schema, ifNotExists = true)
    val ck = getTable(r).flatMap(_.clusterKey)
    tables.put(tKey(r), TableMeta(r.database, r.schema, r.table, "BASE TABLE",
      cols, clusterKey = ck))
  }

  /** Register a view just created via SQL; columns read from the resolved
    * plan. Views carry type VIEW in metadata like the reference's table
    * rows (`repository.go:42-52`). */
  def registerView(r: TableNaming.Ref): Unit = {
    val df = spark.table(sparkTableName(r))
    val cols = df.schema.fields.toSeq.map(f =>
      ColumnDef(up(f.name), TypeMapper.toSnowflakeTypeName(f.dataType), f.nullable))
    tables.put(tKey(r), TableMeta(r.database, r.schema, r.table, "VIEW", cols))
  }

  def dropView(r: TableNaming.Ref, ifExists: Boolean = false): Unit = {
    if (tables.remove(tKey(r)) == null && !ifExists)
      throw SnowflakeError.notFound(
        s"view ${r.database}.${r.schema}.${r.table} does not exist")
    spark.sql(s"DROP VIEW IF EXISTS ${sparkTableName(r)}")
  }

  def dropTable(r: TableNaming.Ref, ifExists: Boolean = false): Unit = {
    if (tables.remove(tKey(r)) == null && !ifExists)
      throw SnowflakeError.notFound(
        s"table ${r.database}.${r.schema}.${r.table} does not exist")
    spark.sql(s"DROP TABLE IF EXISTS ${sparkTableName(r)}")
  }

  def listTables(db: String): Seq[TableMeta] =
    tables.values.asScala.filter(_.database == up(db)).toSeq
      .sortBy(t => (t.schema, t.table))

  def tableDf(r: TableNaming.Ref): DataFrame = {
    if (!tableExists(r))
      throw SnowflakeError.notFound(
        s"table ${r.database}.${r.schema}.${r.table} does not exist")
    spark.table(sparkTableName(r))
  }

  /** Replace table content atomically-per-table: materialize the new rows
    * to a temp parquet dir first (the plan may read the table being
    * replaced), then overwrite under the table lock. */
  def overwriteTable(r: TableNaming.Ref, df: DataFrame): Unit =
    lockFor(r).synchronized {
      val ck = getTable(r).flatMap(_.clusterKey)
      val tmp = Files.createTempDirectory("graft_cow")
      try {
        df.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        write(spark.read.parquet(tmp.toString), ck)
          .mode(SaveMode.Overwrite)
          .saveAsTable(sparkTableName(r))
      } finally deleteRecursively(tmp)
    }

  def appendToTable(r: TableNaming.Ref, df: DataFrame): Unit =
    lockFor(r).synchronized {
      write(df, getTable(r).flatMap(_.clusterKey))
        .mode(SaveMode.Append)
        .saveAsTable(sparkTableName(r))
    }

  def setTableComment(r: TableNaming.Ref, comment: String): Unit =
    Option(tables.get(tKey(r))).foreach(_.comment = comment)

  /** Move a table's catalog entry under a new name (the physical rename is
    * the caller's ALTER TABLE RENAME; metadata moves here). */
  def renameTable(from: TableNaming.Ref, to: TableNaming.Ref): Unit =
    lockFor(from).synchronized {
      val m = Option(tables.remove(tKey(from))).getOrElse(
        throw SnowflakeError.notFound(
          s"table ${from.database}.${from.schema}.${from.table} does not exist"))
      if (tables.containsKey(tKey(to))) {
        tables.put(tKey(from), m) // restore — rename refused
        throw SnowflakeError.alreadyExists(
          s"table ${to.database}.${to.schema}.${to.table} already exists")
      }
      tables.put(tKey(to),
        m.copy(database = to.database, schema = to.schema, table = to.table))
    }

  /** Re-install a snapshotted metadata row (transaction ROLLBACK after a
    * DROP/REPLACE restores the parquet AND the catalog entry, preserving
    * the cluster key so the restoring write re-buckets identically). */
  def restoreMeta(m: TableMeta): Unit = {
    createDatabase(m.database)
    createSchema(m.database, m.schema, ifNotExists = true)
    tables.put(s"${m.database}.${m.schema}.${m.table}", m)
  }

  // ---- file formats (reference `repository.go:76-85`) ----------------

  def createFileFormat(db: String, schema: String, name: String,
      formatType: String, rawOptions: String): Unit =
    fileFormats.put(s"${up(db)}.${up(schema)}.${up(name)}",
      FileFormatMeta(up(db), up(schema), up(name), up(formatType), rawOptions))

  def getFileFormat(db: String, schema: String, name: String): Option[FileFormatMeta] =
    Option(fileFormats.get(s"${up(db)}.${up(schema)}.${up(name)}"))

  def dropFileFormat(db: String, schema: String, name: String,
      ifExists: Boolean = false): Unit =
    if (fileFormats.remove(s"${up(db)}.${up(schema)}.${up(name)}") == null && !ifExists)
      throw SnowflakeError.notFound(s"file format ${up(name)} does not exist")

  def listFileFormats(db: String): Seq[FileFormatMeta] =
    fileFormats.values.asScala.filter(_.database == up(db)).toSeq.sortBy(_.name)

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
    finally s.close()
  }
}

object Catalog {
  final case class ColumnDef(
      name: String, snowflakeType: String, nullable: Boolean = true,
      default: Option[String] = None, primaryKey: Boolean = false)

  final case class TableMeta(
      database: String, schema: String, table: String,
      tableType: String, // BASE TABLE | VIEW
      columns: Seq[ColumnDef],
      var comment: String = "",
      createdOn: Long = System.currentTimeMillis(),
      clusterKey: Option[String] = None)

  final case class SchemaMeta(database: String, name: String,
      createdOn: Long = System.currentTimeMillis())
  final case class DatabaseMeta(name: String,
      createdOn: Long = System.currentTimeMillis(),
      var comment: String = "")
  /** Named file format (reference `repository.go:76-85`): the option text
    * is stored raw and re-parsed by CopyParser when COPY references the
    * format by name, so format options have one parsing code path. */
  final case class FileFormatMeta(database: String, schema: String,
      name: String, formatType: String, rawOptions: String)
}
