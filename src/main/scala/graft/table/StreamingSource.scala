package graft.table

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReaderFactory, Scan}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadAllAvailable, ReadLimit, ReadMaxFiles, SupportsTriggerAvailableNow}

/** Streaming READ from a graft table — the source-side complement of
  * [[GraftStreamingWrite]]: `spark.readStream.table("graft.db.t")` turns
  * the snapshot log into a micro-batch stream whose offsets are
  * (snapshot version, files consumed within that version's delta). Each
  * micro-batch reads exactly the files appended in the offset range —
  * the same appends-only delta contract as the batch `since_version`
  * incremental read ([[SnapshotTable.deltaFileList]], one shared
  * algorithm) — so a downstream pipeline (aggregate, dedup, another
  * graft table via the exactly-once sink) consumes each committed row
  * exactly once, checkpointed by offset. This is the Iceberg
  * streaming-read / Snowflake table-stream shape: CDC-as-appends over
  * the table's own commit history.
  *
  * Admission control: `option("maxFilesPerTrigger", n)` bounds every
  * micro-batch to `n` appended files, splitting mid-version when a
  * single append committed more — without it, a stream catching up on a
  * month of appends would plan the WHOLE backlog as one batch, the
  * classic unbounded-first-batch failure at 100 TB. AvailableNow drains
  * then process the backlog as a sequence of bounded batches.
  *
  * Scale: a micro-batch's input is the appended FILES, planned by the
  * stock parquet scan over the delta list — no snapshot diffing beyond
  * per-version manifest reads, no full-table rescans, and the delta is
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
    maxFilesPerTrigger: Option[Int],
    catalystFilters: Seq[Expression],
    rebuild: Seq[SnapshotTable.DataFile] => Scan)
    // SupportsTriggerAvailableNow (not just SupportsAdmissionControl):
    // a source with only admission control gets wrapped in Spark's
    // AvailableNowDataStreamWrapper, whose latestOffset IGNORES the read
    // limit and returns the captured end — the whole backlog as one
    // batch. Implementing the trigger interface directly keeps per-batch
    // limits live during an AvailableNow drain, capped at the end
    // captured when the drain started (the FileStreamSource/Kafka
    // pattern).
    extends MicroBatchStream with SupportsTriggerAvailableNow {

  private def spark: SparkSession = SparkSession.active
  private def table: SnapshotTable = SnapshotTable.load(spark, location)

  // the scan whose partitions the CURRENT batch planned; its reader
  // factory is file-list independent (reads any FilePartition), so the
  // latest one serves createReaderFactory
  @volatile private var lastScan: Scan = _

  override def initialOffset(): Offset =
    GraftStreamOffset(fromVersion, Int.MaxValue) // v fully consumed

  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles).getOrElse(ReadLimit.allAvailable())

  /** Unconsumed work after `o`, one entry per snapshot version:
    * (version, files of its delta already consumed, the delta — sorted
    * for a stable sub-version order). Deltas are per single version step
    * so an offset can land mid-version. */
  private def remaining(t: SnapshotTable, o: GraftStreamOffset)
      : Seq[(Int, Int, Seq[SnapshotTable.DataFile])] = {
    val vs = t.versions
    val head =
      if (o.v >= 0 && o.files != Int.MaxValue && vs.contains(o.v)) {
        val prev = vs.filter(_ < o.v).lastOption.getOrElse(-1)
        val d = t.deltaFileList(prev, o.v, "streaming read").sortBy(_.path)
        if (o.files < d.size) Seq((o.v, o.files, d)) else Seq.empty
      } else Seq.empty
    var prev = o.v
    head ++ vs.filter(_ > o.v).map { v =>
      val d = t.deltaFileList(prev, v, "streaming read").sortBy(_.path)
      prev = v
      (v, 0, d)
    }
  }

  // end bound captured when an AvailableNow drain starts: appends
  // committed DURING the drain are left for the next run
  @volatile private var availableNowCap: Option[GraftStreamOffset] = None

  override def prepareForTriggerAvailableNow(): Unit = {
    val t = table
    val end = remaining(t, GraftStreamOffset(-1, Int.MaxValue)).lastOption
      .map { case (v, _, delta) => GraftStreamOffset(v, delta.size) }
      .getOrElse(GraftStreamOffset(-1, Int.MaxValue))
    availableNowCap = Some(end)
  }

  private def lessThan(a: GraftStreamOffset, b: GraftStreamOffset): Boolean =
    a.v < b.v || (a.v == b.v && a.files < b.files)

  /** Cap `end` at the drain bound, never regressing below `start`. */
  private def capped(start: GraftStreamOffset,
      end: GraftStreamOffset): GraftStreamOffset =
    availableNowCap match {
      case Some(cap) if lessThan(cap, end) =>
        if (lessThan(cap, start)) start else cap
      case _ => end
    }

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val o = GraftStreamOffset.of(start)
    val work = remaining(table, o)
    if (work.isEmpty) return o
    limit match {
      case m: ReadMaxFiles =>
        var budget = m.maxFiles()
        var end = o
        work.foreach { case (v, consumed, delta) =>
          if (budget > 0) {
            val take = math.min(delta.size - consumed, budget)
            end = GraftStreamOffset(v, consumed + take)
            budget -= take
          }
        }
        capped(o, end)
      case _: ReadAllAvailable =>
        val (v, _, delta) = work.last
        capped(o, GraftStreamOffset(v, delta.size))
      case other => throw new UnsupportedOperationException(
        s"read limit not supported by graft streaming source: $other")
    }
  }

  override def latestOffset(): Offset =
    latestOffset(initialOffset(), ReadLimit.allAvailable())

  override def deserializeOffset(json: String): Offset =
    GraftStreamOffset.fromJson(json)

  override def commit(end: Offset): Unit = () // offsets live in the checkpoint

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = GraftStreamOffset.of(start)
    val e = GraftStreamOffset.of(end)
    val files = remaining(table, s).flatMap { case (v, consumed, delta) =>
      if (v < e.v) delta.drop(consumed)
      else if (v == e.v) delta.slice(consumed, e.files)
      else Seq.empty
    }
    // same two-tier pruning as the batch scan: the pushed filters first
    // drop delta files whose manifest min/max cannot match
    val pruned = StatsPruning.prune(files,
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

/** Offset = (snapshot version, files consumed within that version's
  * delta); `files = Int.MaxValue` marks the version fully consumed (also
  * how pre-admission-control checkpoints without a `files` field parse,
  * preserving their semantics). */
private[table] case class GraftStreamOffset(v: Int, files: Int) extends Offset {
  override def json(): String = s"""{"version":$v,"files":$files}"""
}

private[table] object GraftStreamOffset {
  private val Re =
    """\{\s*"version"\s*:\s*(-?\d+)\s*(?:,\s*"files"\s*:\s*(\d+)\s*)?\}""".r

  def fromJson(json: String): GraftStreamOffset = json.trim match {
    case Re(n, f) =>
      GraftStreamOffset(n.toInt, Option(f).map(_.toInt).getOrElse(Int.MaxValue))
    case other => throw new IllegalArgumentException(s"bad graft offset: $other")
  }

  def of(o: Offset): GraftStreamOffset = o match {
    case g: GraftStreamOffset => g
    case other => fromJson(other.json())
  }
}
