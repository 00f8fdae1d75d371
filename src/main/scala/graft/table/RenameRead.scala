package graft.table

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.vectorized.ColumnarBatch

/** DSv2 read support for tables with an ACTIVE rename mapping — live data
  * files that physically store a column under a name the declared schema
  * no longer uses (RENAME COLUMN is metadata-only; see
  * [[SnapshotTable.renameColumn]]).
  *
  * The file list is grouped by schema GENERATION (the local names each
  * file was written under, resolved through the snapshot's rename log);
  * each group gets its own stock parquet scan whose read schema carries
  * the group's local names in the declared columns' POSITIONS — so every
  * group emits position- and type-identical rows, and the union needs no
  * per-row remapping, only a dispatch of each partition to its group's
  * reader factory. A freshly renamed table therefore reads as
  * (generations) co-planned scans; compaction rewrites every file under
  * the current names and collapses the table back to the ordinary
  * single-scan fast path ([[SnapshotTable.needsRenameMapping]] gates the
  * whole mechanism off again).
  */
private[table] object RenameRead {

  /** Group a file list by its schema generation's local names for the
    * `declared` columns. Empty input yields one identity group so
    * callers always have a scan to build. */
  def groups(files: Seq[SnapshotTable.DataFile], declared: Seq[String],
      renames: Seq[SnapshotTable.Rename])
      : Seq[(Seq[String], Seq[SnapshotTable.DataFile])] =
    if (files.isEmpty) Seq((declared, Seq.empty))
    else files
      .groupBy(f => SnapshotTable.fileLocalNames(declared, f.schemaVersion, renames))
      .toSeq.sortBy(_._1.mkString(","))
}

/** An input partition tagged with the index of the generation scan that
  * planned it, so the composite reader factory can route it back to the
  * factory whose read schema matches the file's physical column names. */
private[table] case class GroupTaggedPartition(group: Int, inner: InputPartition)
    extends InputPartition

/** Routes each tagged partition to its generation's reader factory. All
  * generations' factories emit the same positions and types (only the
  * requested NAMES differ), so the consumed rows are interchangeable. */
private[table] class GroupDispatchFactory(
    factories: Seq[PartitionReaderFactory]) extends PartitionReaderFactory {

  private def route[A](p: InputPartition)(
      f: (PartitionReaderFactory, InputPartition) => A): A = p match {
    case GroupTaggedPartition(g, inner) => f(factories(g), inner)
    case other => throw new IllegalStateException(
      s"untagged partition under rename-union scan: ${other.getClass}")
  }

  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    route(p)(_.createReader(_))

  override def createColumnarReader(p: InputPartition): PartitionReader[ColumnarBatch] =
    route(p)(_.createColumnarReader(_))

  override def supportColumnarReads(p: InputPartition): Boolean =
    route(p)(_.supportColumnarReads(_))
}

/** The composite scan: one inner parquet scan per schema generation,
  * partitions tagged with their generation, `readSchema` in the DECLARED
  * names. Streaming reads are refused while a mapping is active (the
  * streaming reader factory must be file-list independent, which a
  * generation dispatch is not) — compaction normalizes the table and
  * restores them. */
private[table] class RenameUnionScan(scans: Seq[Scan], declared: StructType)
    extends Scan {

  override def readSchema(): StructType = declared

  override def toBatch: Batch = new Batch {
    private val batches = scans.map(_.toBatch)
    override def planInputPartitions(): Array[InputPartition] =
      batches.zipWithIndex.flatMap { case (b, gi) =>
        b.planInputPartitions().map(p => GroupTaggedPartition(gi, p): InputPartition)
      }.toArray
    override def createReaderFactory(): PartitionReaderFactory =
      new GroupDispatchFactory(batches.map(_.createReaderFactory()))
  }

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    throw new UnsupportedOperationException(
      "streaming read is unavailable while a RENAME COLUMN mapping is " +
        "active on live files — run CALL system.compact to rewrite them " +
        "under the current names, then start the stream")

  override def description(): String =
    s"RenameUnionScan(${scans.size} schema generations) " +
      scans.map(_.description()).mkString(" | ")
}
