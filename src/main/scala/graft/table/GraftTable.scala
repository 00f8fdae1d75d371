package graft.table

import java.util

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.read.ScanBuilder
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, SupportsTruncate, V1Write, Write, WriteBuilder}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.InsertableRelation
import org.apache.spark.sql.types.{DataType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 table over a snapshot-log location: reads delegate to Spark's
  * parquet `FileTable` pinned to one snapshot's file list; writes go
  * through the snapshot commit protocol via the `V1Write` fallback
  * (`InsertableRelation`), so SQL `INSERT INTO` appends a snapshot and
  * `INSERT OVERWRITE` replaces the file list — both atomic, both safe
  * under concurrent writers (S11). The scan keeps the stock vectorized
  * reader/pushdown; the write keeps the log's ACID guarantees.
  */
class GraftTable(tableName: String, location: String,
    snap: SnapshotTable.Snapshot) extends Table with SupportsRead with SupportsWrite {

  private def spark: SparkSession = SparkSession.active

  override def name(): String = tableName

  override def schema(): StructType =
    DataType.fromJson(snap.schemaJson).asInstanceOf[StructType]

  override def capabilities(): util.Set[TableCapability] =
    util.Set.of(TableCapability.BATCH_READ, TableCapability.V1_BATCH_WRITE,
      TableCapability.TRUNCATE)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val inner = ParquetTable(
      s"$tableName@v${snap.version}",
      spark,
      new CaseInsensitiveStringMap(util.Map.of("mergeSchema", "true")),
      snap.files.map(_.path),
      Some(schema()),
      classOf[ParquetFileFormat])
    inner.newScanBuilder(options)
  }

  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var overwrite = false
      override def truncate(): WriteBuilder = { overwrite = true; this }
      override def build(): Write = new V1Write {
        override def toInsertableRelation: InsertableRelation =
          new InsertableRelation {
            override def insert(data: DataFrame, legacyOverwrite: Boolean): Unit = {
              val t = SnapshotTable.load(data.sparkSession, location)
              if (overwrite || legacyOverwrite) t.overwrite(data) else t.append(data)
            }
          }
      }
    }
}
