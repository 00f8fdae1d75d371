package graft.table

import org.apache.spark.sql.connector.expressions.{Expressions, Literal, NamedReference}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.read.{Batch, Scan, Statistics, SupportsReportStatistics, SupportsRuntimeV2Filtering}
import org.apache.spark.sql.sources.{EqualTo, Filter, In}
import org.apache.spark.sql.types.StructType


/** Runtime (dynamic-partition-pruning) filtering for graft scans — the
  * DSv2 seam Iceberg uses for star joins at scale: when a graft table is
  * joined to a filtered dimension, Spark's `PartitionPruning` rule plans
  * a runtime IN filter over the join keys, executes the dim side first,
  * and calls [[filter]] with the surviving key values BEFORE the fact
  * scan plans its input partitions. The file list is then re-pruned
  * against the manifest min/max stats ([[StatsPruning]] — metadata-only,
  * conservative), so a day-partitioned 100 TB fact table scans only the
  * dim-selected days' files instead of all of them. Static pushdown
  * can't do this: the qualifying keys exist only at runtime.
  *
  * The wrapper delegates everything to the statically-built parquet scan
  * and REBUILDS it (same pushed filters, same pruned columns) over the
  * smaller file list when the runtime predicate prunes anything;
  * `BatchScanExec` re-calls `toBatch.planInputPartitions()` after
  * `filter()`, picking up the rebuilt delegate.
  */
private[table] class GraftRuntimeFilterScan(
    initial: Scan,
    files: Seq[SnapshotTable.DataFile],
    attrs: Seq[String],
    rebuild: Seq[SnapshotTable.DataFile] => Scan)
    extends Scan with GraftRuntimeFilterable with SupportsReportStatistics
    with org.apache.spark.sql.internal.connector.SupportsMetadata {

  @volatile private var delegate: Scan = initial
  @volatile private[graft] var currentFiles: Seq[SnapshotTable.DataFile] = files

  private[graft] def delegateScan: Scan = delegate

  override def readSchema(): StructType = delegate.readSchema()
  override def toBatch: Batch = delegate.toBatch
  override def description(): String =
    s"GraftRuntimeFilterScan(${currentFiles.size}/${files.size} files) " +
      delegate.description()

  override def filterAttributes(): Array[NamedReference] =
    RuntimeFiltering.visibleAttrs(attrs, initial.readSchema())

  override def filter(predicates: Array[Predicate]): Unit =
    RuntimeFiltering.pruneFiles(currentFiles, predicates).foreach { pruned =>
      currentFiles = pruned
      delegate = rebuild(pruned)
    }

  // Scan equality drives exchange/scan reuse in the planner (ParquetScan
  // is a case class; reference equality here would silently disable reuse
  // for self-joins over graft tables). Keyed on the IMMUTABLE
  // construction state — the statically-built scan plus the file-list
  // fingerprint — never the mutable runtime-filtered delegate: scan
  // objects sit as keys in hash-based reuse maps, and a key whose
  // hashCode changes when filter() fires mid-execution degrades those
  // maps to missed lookups. Construction-keyed equality cannot cause
  // INCORRECT reuse either: reuse decisions compare whole plan nodes, and
  // BatchScanExec's own equality includes its runtimeFilters, so two
  // same-table scans under different runtime filters still compare
  // unequal at the plan level.
  private val fingerprint: Seq[String] = files.map(_.path)
  private[table] def initialScan: Scan = initial
  private[table] def fileFingerprint: Seq[String] = fingerprint
  override def equals(other: Any): Boolean = other match {
    case g: GraftRuntimeFilterScan =>
      initial == g.initialScan && fingerprint == g.fileFingerprint
    case _ => false
  }
  override def hashCode(): Int = initial.hashCode()

  // EXPLAIN renders scan detail (PushedFilters, ReadSchema, file counts)
  // through this internal trait — without the delegation, wrapping would
  // strip that from every graft plan's formatted output
  override def getMetaData(): Map[String, String] = delegate match {
    case m: org.apache.spark.sql.internal.connector.SupportsMetadata =>
      m.getMetaData() + ("RuntimeFilterFiles" -> s"${currentFiles.size}/${files.size}")
    case _ => Map.empty
  }

  // without this, DataSourceV2Relation falls back to defaultSizeInBytes
  // (effectively "huge") and the planner would never broadcast the other
  // side of a join against a graft table
  override def estimateStatistics(): Statistics = delegate match {
    case s: SupportsReportStatistics => s.estimateStatistics()
    case _ => new Statistics {
      override def sizeInBytes() = java.util.OptionalLong.empty()
      override def numRows() = java.util.OptionalLong.empty()
    }
  }
}

/** Common surface of the graft scans that accept DSv2 runtime filters —
  * the plain wrapper and the key-grouped (SPJ) scan. Specs drive runtime
  * pruning through this trait without caring which concrete scan the
  * bucketing conf selected. */
private[graft] trait GraftRuntimeFilterable extends SupportsRuntimeV2Filtering {
  private[graft] def currentFiles: Seq[SnapshotTable.DataFile]
}

private[graft] object RuntimeFiltering {

  /** The statically-planned scan under a graft scan wrapper (specs
    * inspect `FileScan.fileIndex`; pass-through for other scans). */
  def unwrap(s: Scan): Scan = s match {
    case g: GraftRuntimeFilterScan => g.delegateScan
    case k: GraftKeyGroupedScan => k.innerScan
    case other => other
  }

  /** Visible (readable) filter attributes: pruning-eligible columns that
    * survived column pruning — Spark resolves these against the scan
    * relation's output, and an unresolvable reference is an analysis
    * error rather than a skipped optimization. */
  def visibleAttrs(attrs: Seq[String], readSchema: StructType): Array[NamedReference] = {
    val visible = readSchema.fieldNames.toSet
    attrs.filter(visible).map(Expressions.column).toArray
  }

  /** Translate runtime predicates and prune `files`; Some(pruned) only
    * when the file list actually shrank. */
  def pruneFiles(files: Seq[SnapshotTable.DataFile],
      predicates: Array[Predicate]): Option[Seq[SnapshotTable.DataFile]] = {
    val sourceFilters = predicates.toSeq.flatMap(v2ToSource)
    if (sourceFilters.isEmpty) None
    else {
      val pruned = StatsPruning.prune(files, sourceFilters)
      if (pruned.size < files.size) Some(pruned) else None
    }
  }

  /** Translate the runtime V2 predicates Spark hands to `filter()` into
    * the source-filter shapes [[StatsPruning]] prunes on. DPP produces
    * `IN(col, v1..vk)` (`DataSourceV2Strategy.translateRuntimeFilterV2`);
    * `=` is accepted for completeness. Values stay in catalyst internal
    * form (UTF8String / micros / epoch days) — StatsPruning compares
    * those natively. Unknown shapes translate to None (→ no pruning,
    * never wrong results). */
  def v2ToSource(p: Predicate): Option[Filter] = {
    def colName(e: Any): Option[String] = e match {
      case r: NamedReference => Some(r.fieldNames.mkString("."))
      case _ => None
    }
    p.name() match {
      case "IN" if p.children().nonEmpty =>
        for {
          c <- colName(p.children().head)
          vs <- Some(p.children().drop(1)) if vs.forall(_.isInstanceOf[Literal[_]])
        } yield In(c, vs.map(_.asInstanceOf[Literal[_]].value.asInstanceOf[Any]))
      case "=" if p.children().length == 2 =>
        (colName(p.children()(0)), p.children()(1)) match {
          case (Some(c), l: Literal[_]) => Some(EqualTo(c, l.value))
          case _ => None
        }
      case _ => None
    }
  }
}
