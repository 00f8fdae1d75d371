package graft.table

import java.util

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource-v2 catalog over [[SnapshotTable]] locations, giving the
  * snapshot log a SQL surface — including the reference's time-travel
  * syntax (T4, `performance_comparison.sql:129-131`):
  *
  * {{{
  *   spark.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
  *   spark.conf.set("spark.sql.catalog.graft.warehouse", "/path/to/warehouse")
  *   spark.sql("SELECT count(*) FROM graft.db.events VERSION AS OF 0")
  *   spark.sql("SELECT count(*) FROM graft.db.events TIMESTAMP AS OF '…'")
  * }}}
  *
  * A table named `graft.ns….name` resolves to the snapshot-log directory
  * `<warehouse>/ns…/name`. Reads delegate to Spark's own parquet DSv2
  * `FileTable` over the pinned snapshot's file list, so scans get the
  * stock vectorized reader, pushdown, and codegen for free; the catalog
  * only decides WHICH files a given version/timestamp sees — exactly the
  * Iceberg metadata/data split. Writes go through the programmatic
  * [[SnapshotTable]] API (the commit protocol owns atomicity; SQL DML is
  * out of scope this milestone).
  */
class GraftCatalog extends TableCatalog with SupportsNamespaces {

  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse(graft.Tables.scratch("warehouse/graft-catalog"))
  }

  override def name(): String = catalogName

  private def location(ident: Identifier): String =
    (Seq(warehouse) ++ ident.namespace().toSeq :+ ident.name()).mkString("/")

  private def spark: SparkSession = SparkSession.active

  private def open(ident: Identifier): SnapshotTable = {
    if (!new java.io.File(s"${location(ident)}/_snapshots").isDirectory)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    SnapshotTable.load(spark, location(ident))
  }

  private def parquetTable(ident: Identifier, snap: SnapshotTable.Snapshot): Table =
    new GraftTable(
      s"$catalogName.${ident.namespace().mkString(".")}.${ident.name()}",
      location(ident), snap)

  override def loadTable(ident: Identifier): Table = {
    val t = open(ident)
    parquetTable(ident, t.snapshot(t.latestVersion))
  }

  /** `VERSION AS OF v` */
  override def loadTable(ident: Identifier, version: String): Table = {
    val t = open(ident)
    parquetTable(ident, t.snapshot(version.toInt))
  }

  /** `TIMESTAMP AS OF ts` — Spark passes microseconds since epoch. */
  override def loadTable(ident: Identifier, timestamp: Long): Table = {
    val t = open(ident)
    val ms = timestamp / 1000L
    val vs = t.versions.map(t.snapshot).filter(_.timestampMs <= ms)
    if (vs.isEmpty)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    parquetTable(ident, vs.maxBy(_.version))
  }

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val dir = new java.io.File((Seq(warehouse) ++ namespace).mkString("/"))
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => new java.io.File(f, "_snapshots").isDirectory)
      .map(f => Identifier.of(namespace, f.getName))
  }

  override def tableExists(ident: Identifier): Boolean =
    new java.io.File(s"${location(ident)}/_snapshots").isDirectory

  override def createTable(ident: Identifier, schema: StructType,
      partitions: Array[Transform], properties: util.Map[String, String]): Table = {
    require(partitions.isEmpty, "partition transforms not supported yet")
    if (tableExists(ident))
      throw new org.apache.spark.sql.catalyst.analysis.TableAlreadyExistsException(ident)
    val t = SnapshotTable.createEmpty(spark, location(ident), schema)
    parquetTable(ident, t.snapshot(t.latestVersion))
  }

  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    throw new UnsupportedOperationException("use SnapshotTable.append with a wider schema")

  override def dropTable(ident: Identifier): Boolean = {
    val exists = tableExists(ident)
    if (exists) graft.Tables.deleteRecursively(location(ident))
    exists
  }

  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    throw new UnsupportedOperationException("rename not supported")

  // ------------------------------------------------- SupportsNamespaces
  override def listNamespaces(): Array[Array[String]] = {
    val dir = new java.io.File(warehouse)
    Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && !new java.io.File(f, "_snapshots").isDirectory)
      .map(f => Array(f.getName))
  }

  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    Array.empty

  override def loadNamespaceMetadata(namespace: Array[String]): util.Map[String, String] = {
    if (!new java.io.File((Seq(warehouse) ++ namespace).mkString("/")).isDirectory)
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchNamespaceException(namespace)
    util.Map.of()
  }

  override def createNamespace(namespace: Array[String],
      metadata: util.Map[String, String]): Unit =
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get((Seq(warehouse) ++ namespace).mkString("/")))

  override def alterNamespace(namespace: Array[String],
      changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("namespace metadata is immutable")

  override def dropNamespace(namespace: Array[String], cascade: Boolean): Boolean = {
    val p = (Seq(warehouse) ++ namespace).mkString("/")
    val exists = new java.io.File(p).isDirectory
    if (exists && cascade) graft.Tables.deleteRecursively(p)
    exists
  }
}
