package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, HasPartitionKey, InputPartition, PartitionReaderFactory, Scan, Statistics, SupportsReportPartitioning, SupportsReportStatistics}
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.execution.datasources.{FilePartition, PartitionedFile}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned join (SPJ) support: when
  * `spark.sql.sources.v2.bucketing.enabled` (Spark's switch, default on)
  * AND `spark.sql.graft.planning.preserveDataGrouping` (the graft
  * opt-in, off by default) are set and the table is partitioned
  * (identity or `bucket(n, col)` — [[PartitionFields]]), the scan
  * reports `KeyGroupedPartitioning` over the partition transforms and
  * plans ONE input partition per partition value (each implementing
  * `HasPartitionKey`). Two graft tables partitioned the same way then
  * join WITHOUT any shuffle — Spark's `EnsureRequirements` recognizes
  * the co-partitioning, the DSv2 feature Iceberg uses to make fact-fact
  * joins feasible at 100 TB (a shuffle of two 100 TB sides is the single
  * most expensive operation a join can incur; co-located reads eliminate
  * it entirely). Bucket transforms extend this to HIGH-CARDINALITY join
  * keys, resolved through the catalog's FunctionCatalog `bucket`
  * function for compatibility checking. The separate opt-in exists
  * because per-key planning caps SCAN parallelism at the
  * partition-value count — right for a co-partitioned join, wrong for a
  * plain huge-table scan — mirroring Iceberg's preserve-data-grouping
  * switch.
  *
  * The per-file partition value comes from the manifest stats: the
  * partitioned write layout produces one value per file, so min == max
  * for every partition field. Files violating that (pre-partitioning
  * snapshots, flat rewrite files) make [[KeyGroupedScan.fileKeys]]
  * return None and the table falls back to the ordinary
  * runtime-filterable scan — reporting a wrong grouping would produce
  * wrong join results, so eligibility is all-or-nothing ([[SnapshotTable
  * .compact]] is the re-key path that restores it).
  */
private[table] object KeyGroupedScan {

  /** file path (URI-path form) → partition-key values, or None when any
    * file cannot be keyed (missing stats or min != max). Identity fields
    * key by the column value under the column's type; bucket fields by
    * the bucket id (IntegerType — the bound bucket function's result
    * type, which is what the planner compares key rows under). */
  def fileKeys(files: Seq[SnapshotTable.DataFile], partCols: Seq[String],
      schema: StructType): Option[Map[String, Seq[Any]]] = {
    val fields = partCols.map(PartitionFields.parse)
    val types: Seq[Option[DataType]] = fields.map {
      case PartitionFields.Identity(c) => schema.find(_.name == c).map(_.dataType)
      case PartitionFields.Bucket(_, _) => Some(IntegerType)
      // truncate keys carry the source column's type (prefix / floored
      // multiple)
      case PartitionFields.Truncate(_, c) => schema.find(_.name == c).map(_.dataType)
      // days keys are dates; months/years their since-1970 ordinals
      case PartitionFields.TimeUnit("days", _) => Some(DateType)
      case PartitionFields.TimeUnit(_, _) => Some(IntegerType)
    }
    if (types.exists(_.isEmpty)) return None
    val entries = files.map { f =>
      val vals = fields.zip(types.map(_.get)).map { case (field, dt) =>
        f.stats.get(field.name) match {
          case Some(cs) if cs.min == cs.max => internalValue(cs.min, dt)
          case _ => None
        }
      }
      if (vals.exists(_.isEmpty)) return None
      normalize(f.path) -> vals.map(_.get)
    }
    Some(entries.toMap)
  }

  def normalize(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** A FilePartition (so the stock parquet reader factory consumes it
    * unchanged) that also carries its partition-key row for SPJ
    * grouping. Top-level on purpose: input partitions are serialized
    * into tasks, and an inner class would drag the whole scan along. */
  private[table] class KeyedFilePartition(index: Int,
      files: Array[PartitionedFile], key: InternalRow)
      extends FilePartition(index, files) with HasPartitionKey {
    override def partitionKey(): InternalRow = key
  }

  /** Stats bound → catalyst internal value under the column's type; the
    * same tagged representations [[StatsPruning]] compares (dates are
    * epoch days, timestamps micros). */
  private def internalValue(bound: String, dt: DataType): Option[Any] = try {
    dt match {
      case LongType => Some(bound.toLong)
      case IntegerType => Some(bound.toInt)
      case ShortType => Some(bound.toShort)
      case ByteType => Some(bound.toByte)
      case DoubleType => Some(bound.toDouble)
      case FloatType => Some(bound.toFloat)
      case StringType => Some(UTF8String.fromString(bound))
      case DateType => Some(bound.toInt)
      case TimestampType | TimestampNTZType => Some(bound.toLong)
      case _ => None
    }
  } catch { case _: NumberFormatException => None }
}

private[table] class GraftKeyGroupedScan(
    inner: Scan, partCols: Seq[String], keys: Map[String, Seq[Any]],
    files: Seq[SnapshotTable.DataFile], attrs: Seq[String],
    rebuild: Seq[SnapshotTable.DataFile] => Scan)
    extends Scan with SupportsReportPartitioning with GraftRuntimeFilterable
    with SupportsReportStatistics
    with org.apache.spark.sql.internal.connector.SupportsMetadata {

  @volatile private var delegate: Scan = inner
  @volatile private[graft] var currentFiles: Seq[SnapshotTable.DataFile] = files
  @volatile private var cachedGroups: Array[InputPartition] = _

  private[graft] def innerScan: Scan = delegate

  /** One keyed partition PER FILE, not per key: Spark's own
    * `DataSourceV2ScanExecBase.groupPartitions` merges same-key splits
    * into one task when it needs fully-clustered input, and — under
    * `spark.sql.sources.v2.bucketing.{pushPartValues,
    * partiallyClusteredDistribution}.enabled` — deliberately KEEPS them
    * split, replicating the other join side over the splits, so a hot
    * partition value runs as many tasks as it has files instead of one
    * straggler (the SPJ skew mitigation; Iceberg reports per-task-group
    * keyed splits for the same reason). Emitting pre-merged groups here
    * would make that choice for Spark and cap the hot key at one task. */
  private def grouped: Array[InputPartition] = {
    if (cachedGroups == null) {
      val allFiles = delegate.toBatch.planInputPartitions().flatMap {
        case fp: FilePartition => fp.files
        case other => throw new IllegalStateException(
          s"unexpected input partition ${other.getClass} under key-grouped scan")
      }
      cachedGroups = allFiles
        .map(pf => keys(KeyGroupedScan.normalize(pf.filePath.toString)) -> pf)
        .sortBy { case (keyVals, pf) =>
          (keyVals.mkString(" "), pf.filePath.toString) // deterministic order
        }
        .zipWithIndex
        .map { case ((keyVals, pf), i) =>
          new KeyGroupedScan.KeyedFilePartition(i, Array(pf),
            new GenericInternalRow(keyVals.toArray)): InputPartition
        }
        .toArray
    }
    cachedGroups
  }

  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      partCols.map(PartitionFields.parse).map {
        case PartitionFields.Identity(c) => Expressions.identity(c)
          : org.apache.spark.sql.connector.expressions.Expression
        // width-baked name (truncate_3(col), NOT truncate(3, col)): the
        // generic translation keeps a literal argument as an expression
        // leaf, and a non-attribute leaf can never satisfy a clustered
        // distribution — baking the width into the FunctionCatalog name
        // leaves the column as the only child, making truncate
        // co-partitioning SPJ-checkable exactly like bucket (whose
        // literal Spark special-cases out of the children)
        case PartitionFields.Truncate(w, c) =>
          Expressions.apply(s"truncate_$w", Expressions.column(c))
          : org.apache.spark.sql.connector.expressions.Expression
        case PartitionFields.Bucket(n, c) => Expressions.bucket(n, c)
          : org.apache.spark.sql.connector.expressions.Expression
        case PartitionFields.TimeUnit("hours", c) => Expressions.hours(c)
          : org.apache.spark.sql.connector.expressions.Expression
        case PartitionFields.TimeUnit("days", c) => Expressions.days(c)
          : org.apache.spark.sql.connector.expressions.Expression
        case PartitionFields.TimeUnit("months", c) => Expressions.months(c)
          : org.apache.spark.sql.connector.expressions.Expression
        case PartitionFields.TimeUnit(_, c) => Expressions.years(c)
          : org.apache.spark.sql.connector.expressions.Expression
      }.toArray,
      grouped.length)

  // SPJ and DPP compose (as in Iceberg): a runtime IN filter from a
  // joined dim prunes whole files -- hence whole key groups -- and the
  // partitions are re-planned from the pruned set; BatchScanExec
  // re-groups the filtered partitions by key after calling filter().
  override def filterAttributes(): Array[NamedReference] =
    RuntimeFiltering.visibleAttrs(attrs, inner.readSchema())

  override def filter(predicates: Array[Predicate]): Unit =
    RuntimeFiltering.pruneFiles(currentFiles, predicates).foreach { pruned =>
      currentFiles = pruned
      delegate = rebuild(pruned)
      cachedGroups = null
    }

  override def toBatch: Batch = new Batch {
    override def planInputPartitions(): Array[InputPartition] = grouped
    override def createReaderFactory(): PartitionReaderFactory =
      delegate.toBatch.createReaderFactory()
  }

  override def readSchema(): StructType = inner.readSchema()
  override def description(): String =
    s"GraftKeyGroupedScan(${partCols.mkString(",")}; " +
      s"${currentFiles.size}/${files.size} files) " + inner.description()

  // Same equality contract as GraftRuntimeFilterScan (reference equality
  // would silently disable scan/exchange/subquery reuse for SPJ
  // self-joins): keyed on the immutable construction state — initial
  // scan, grouping columns, file fingerprint — so the hash never mutates
  // while the object sits in a planner reuse map.
  private val fingerprint: Seq[String] = files.map(_.path)
  private[table] def initialScan: Scan = inner
  private[table] def groupCols: Seq[String] = partCols
  private[table] def fileFingerprint: Seq[String] = fingerprint
  override def equals(other: Any): Boolean = other match {
    case g: GraftKeyGroupedScan =>
      inner == g.initialScan && partCols == g.groupCols &&
        fingerprint == g.fileFingerprint
    case _ => false
  }
  override def hashCode(): Int = (inner, partCols).hashCode()

  override def getMetaData(): Map[String, String] = inner match {
    case m: org.apache.spark.sql.internal.connector.SupportsMetadata =>
      m.getMetaData() + ("KeyGroupedBy" -> partCols.mkString(", "))
    case _ => Map.empty
  }

  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
}
