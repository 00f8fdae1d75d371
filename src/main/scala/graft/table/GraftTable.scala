package graft.table

import java.util

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  private def innerBuilder(files: Seq[SnapshotTable.DataFile],
      options: CaseInsensitiveStringMap): ScanBuilder =
    ParquetTable(
      s"$tableName@v${snap.version}",
      spark,
      new CaseInsensitiveStringMap(util.Map.of("mergeSchema", "true")),
      files.map(_.path),
      Some(schema()),
      classOf[ParquetFileFormat]).newScanBuilder(options)

  /** Scan builder with manifest-stats file skipping: pushed filters first
    * prune the snapshot's file list against per-file min/max stats
    * ([[StatsPruning]] — metadata-only, conservative), then everything
    * delegates to the stock parquet builder over the surviving files, so
    * column pruning, row-group pushdown, and the vectorized reader are
    * unchanged. Two pruning tiers, exactly like Iceberg: manifest stats
    * (here) then parquet footers (inner scan).
    */
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder
        with org.apache.spark.sql.internal.connector.SupportsPushDownCatalystFilters
        with org.apache.spark.sql.connector.read.SupportsPushDownRequiredColumns
        with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
      import org.apache.spark.sql.catalyst.expressions.Expression
      import org.apache.spark.sql.connector.expressions.aggregate.Aggregation
      import org.apache.spark.sql.connector.read.SupportsPushDownAggregates
      import org.apache.spark.sql.execution.datasources.v2.FileScanBuilder

      private var inner: FileScanBuilder = _
      private def ensureInner(files: Seq[SnapshotTable.DataFile]): Unit =
        if (inner == null)
          inner = innerBuilder(files, options).asInstanceOf[FileScanBuilder]

      // footer-stats aggregate pushdown (COUNT/MIN/MAX answered from
      // parquet metadata) — delegate to the parquet builder, which sees
      // only the stats-pruned file set
      override def supportCompletePushDown(agg: Aggregation): Boolean = {
        ensureInner(snap.files)
        inner.asInstanceOf[SupportsPushDownAggregates].supportCompletePushDown(agg)
      }

      override def pushAggregation(agg: Aggregation): Boolean = {
        ensureInner(snap.files)
        inner.asInstanceOf[SupportsPushDownAggregates].pushAggregation(agg)
      }

      override def pushFilters(filters: Seq[Expression]): Seq[Expression] = {
        val sourceFilters = filters.flatMap(StatsPruning.fromCatalyst)
        ensureInner(StatsPruning.prune(snap.files, sourceFilters))
        inner.pushFilters(filters)
      }

      override def pushedFilters
          : Array[org.apache.spark.sql.connector.expressions.filter.Predicate] = {
        ensureInner(snap.files)
        inner.pushedFilters
      }

      override def pruneColumns(requiredSchema: StructType): Unit = {
        ensureInner(snap.files)
        inner.pruneColumns(requiredSchema)
      }

      override def build(): org.apache.spark.sql.connector.read.Scan = {
        ensureInner(snap.files)
        inner.build()
      }
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
