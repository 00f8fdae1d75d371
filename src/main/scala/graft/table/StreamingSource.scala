package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}

/** Streaming READ from a graft table — the source-side complement of
  * [[GraftStreamingWrite]]: `spark.readStream.table("graft.db.t")` turns
  * the snapshot log into a micro-batch stream whose offsets are SNAPSHOT
  * VERSIONS. Each micro-batch reads exactly the files appended in
  * `(startVersion, endVersion]` — the same appends-only delta contract as
  * the batch `since_version` incremental read — so a downstream pipeline
  * (aggregate, dedup, another graft table via the exactly-once sink)
  * consumes each committed row exactly once, checkpointed by version.
  * This is the Iceberg streaming-read / Snowflake table-stream shape:
  * CDC-as-appends over the table's own commit history.
  *
  * Scale: a micro-batch's input is the appended FILES, planned by the
  * stock parquet scan over the delta list — no snapshot diffing beyond
  * two manifest reads, no full-table rescans, and the delta list is
  * manifest-stats pruned against the query's pushed filters before
  * planning. Non-append commits (compact/overwrite/delete) in the
  * offset range fail the stream with a clear error instead of silently
  * double-reading rewritten rows; expire_snapshots that collects a
  * checkpointed version fails the restart the same way.
  *
  * `option("stream_from_version", v)` starts a NEW stream at version `v`
  * (exclusive) — `-1` (default) streams the table from the beginning,
  * `latestVersion` tails only future appends.
  */
private[table] class GraftMicroBatchStream(
    location: String,
    fromVersion: Int,
    catalystFilters: Seq[Expression],
    rebuild: Seq[SnapshotTable.DataFile] => Scan) extends MicroBatchStream {

  private def spark: SparkSession = SparkSession.active
  private def table: SnapshotTable = SnapshotTable.load(spark, location)

  // the scan whose partitions the CURRENT batch planned; its reader
  // factory is file-list independent (reads any FilePartition), so the
  // latest one serves createReaderFactory
  @volatile private var lastScan: Scan = _

  override def initialOffset(): Offset = GraftVersionOffset(fromVersion)

  override def latestOffset(): Offset = GraftVersionOffset(table.latestVersion)

  override def deserializeOffset(json: String): Offset =
    GraftVersionOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint

  override def stop(): Unit = ()

  /** Files appended in `(start, end]` — [[SnapshotTable.deltaFileList]],
    * the one appends-only delta algorithm every incremental surface
    * shares. */
  private def deltaFiles(start: Int, end: Int): Seq[SnapshotTable.DataFile] =
    if (end <= start) Seq.empty
    else table.deltaFileList(start, end, "streaming read")

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val delta = deltaFiles(
      GraftVersionOffset.version(start), GraftVersionOffset.version(end))
    // same two-tier pruning as the batch scan: the pushed filters first
    // drop delta files whose manifest min/max cannot match
    val pruned = StatsPruning.prune(delta,
      catalystFilters.flatMap(StatsPruning.fromCatalyst))
    if (pruned.isEmpty) Array.empty
    else {
      val scan = rebuild(pruned)
      lastScan = scan
      scan.toBatch.planInputPartitions()
    }
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    val scan = if (lastScan != null) lastScan else rebuild(Seq.empty)
    scan.toBatch.createReaderFactory()
  }
}

/** A snapshot version as a streaming offset; `-1` = before the table's
  * first snapshot. */
private[table] case class GraftVersionOffset(v: Int) extends Offset {
  override def json(): String = s"""{"version":$v}"""
}

private[table] object GraftVersionOffset {
  private val Re = """\{\s*"version"\s*:\s*(-?\d+)\s*\}""".r

  def fromJson(json: String): GraftVersionOffset = json.trim match {
    case Re(n) => GraftVersionOffset(n.toInt)
    case other => throw new IllegalArgumentException(s"bad graft offset: $other")
  }

  def version(o: Offset): Int = o match {
    case GraftVersionOffset(n) => n
    case other => fromJson(other.json()).v
  }
}
