package graft.table

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A snapshot-log table: Iceberg-semantics capabilities (ACID append, time
  * travel, compaction, snapshot expiration, additive schema evolution) over
  * plain Parquet files — the multi-engine-readable layout the reference
  * demos (its files stay scannable by DuckDB et al., reference
  * `aws-community-builders-presentation.md:996-1039`).
  *
  * Commit protocol (mirrors the reference's 4-step Iceberg commit,
  * `aws-community-builders-presentation.md:203-224`):
  *   1. write new data files into an immutable staging dir under `data/`;
  *   2. build the next snapshot: full file list + schema + operation;
  *   3. serialize to `_snapshots/.tmp-*`;
  *   4. atomically rename to `_snapshots/v%05d.json` — the rename is the
  *      commit point. A concurrent writer that loses the race gets
  *      `FileAlreadyExistsException`, re-reads the latest snapshot, and
  *      retries on top of it (optimistic concurrency, last-writer-wins on
  *      file-list merge).
  *
  * Readers pin a snapshot once at scan creation (snapshot isolation):
  * `read`/`readVersion`/`readAsOf` resolve the file list from one JSON
  * document and never see a half-committed state.
  *
  * Scale notes: the log holds file paths + counts only (O(files), like an
  * Iceberg manifest list); data moves through ordinary distributed
  * `df.write.parquet`, so a 1000-executor cluster writes in parallel and
  * only the O(KB) pointer swap is centralized.
  */
final class SnapshotTable private (val spark: SparkSession, val location: String) {

  private def snapDir: Path = Paths.get(location, "_snapshots")

  // ------------------------------------------------------------ snapshots

  /** Sorted list of committed snapshot versions. */
  def versions: Seq[Int] =
    if (!Files.isDirectory(snapDir)) Seq.empty
    else Files.list(snapDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case SnapshotTable.SnapName(v) => v.toInt }
      .toSeq.sorted

  def latestVersion: Int = versions.lastOption.getOrElse(-1)

  def snapshot(version: Int): SnapshotTable.Snapshot =
    SnapshotTable.parseSnapshot(
      Files.readString(snapDir.resolve(f"v$version%05d.json")))

  // ---------------------------------------------------------------- reads

  /** Read the latest snapshot (schema union across files → additive schema
    * evolution: rows written before a column was added read as null). */
  def read(): DataFrame = readVersion(latestVersion)

  /** Time travel by version (`VERSION AS OF`). */
  def readVersion(version: Int): DataFrame = {
    val snap = snapshot(version)
    if (snap.files.isEmpty) {
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.types.DataType.fromJson(snap.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType])
    } else {
      spark.read.option("mergeSchema", "true").parquet(snap.files.map(_.path): _*)
    }
  }

  /** Time travel by timestamp (`TIMESTAMP AS OF`): latest snapshot whose
    * commit time is <= the requested instant. */
  def readAsOf(timestampMs: Long): DataFrame = {
    val v = versions.map(snapshot).filter(_.timestampMs <= timestampMs)
      .map(_.version)
    require(v.nonEmpty, s"no snapshot at or before $timestampMs")
    readVersion(v.max)
  }

  /** Table history as a DataFrame (version, committed_at, operation,
    * n_files, n_rows) — the snapshot-metadata observability surface
    * (reference `aws-community-builders-presentation.md:229-258`). */
  def history(): DataFrame = {
    import spark.implicits._
    versions.map { v =>
      val s = snapshot(v)
      (s.version, new java.sql.Timestamp(s.timestampMs), s.operation,
        s.files.size.toLong, s.files.map(_.rows).filter(_ >= 0).sum)
    }.toDF("version", "committed_at", "operation", "n_files", "n_rows")
  }

  // --------------------------------------------------------------- writes

  /** Commit an empty snapshot carrying only a schema (SQL CREATE TABLE). */
  private[table] def commitEmpty(schemaJson: String): Int =
    commitWithRetry(base => base.files, schemaJson, "create")

  /** ACID append: stage new files, then commit (optimistic retry).
    * `operation` tags the snapshot (streaming sinks use it to record the
    * micro-batch id for exactly-once replay detection). */
  def append(df: DataFrame, operation: String = "append"): Int = {
    val staged = stage(df)
    commitWithRetry(base => base.files ++ staged, df.schema.json, operation)
  }

  /** Replace the whole table content atomically (INSERT OVERWRITE). */
  def overwrite(df: DataFrame): Int = {
    val staged = stage(df)
    commitWithRetry(_ => staged, df.schema.json, "overwrite")
  }

  /** Bin-pack compaction (reference T7: target 128–256 MB files,
    * `aws-community-builders-presentation.md:302-307`): rewrite the current
    * file set into ceil(totalBytes / targetBytes) files and swap the file
    * list in one atomic commit. Old files stay on disk for time travel
    * until [[expireSnapshots]] collects them.
    */
  def compact(targetBytes: Long = 256L * 1024 * 1024,
      clusterBy: Seq[String] = Nil): Int = {
    import org.apache.spark.sql.functions.col
    val base = snapshot(latestVersion)
    val totalBytes = base.files.map(f => Files.size(Paths.get(f.path))).sum
    val nFiles = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    val data = read()
    // clusterBy = the reference's Z-order-style layout optimization
    // (aws-community-builders-presentation.md:302-307 as
    // repartitionByRange + in-file sort): files end up with disjoint
    // clustered-column ranges, so the manifest min/max stats prune most
    // files for point/range predicates on those columns.
    val arranged =
      if (clusterBy.nonEmpty)
        data.repartitionByRange(nFiles, clusterBy.map(col): _*)
          .sortWithinPartitions(clusterBy.map(col): _*)
      else data.repartition(nFiles)
    val staged = stage(arranged)
    commitWithRetry(_ => staged, base.schemaJson, "compact")
  }

  /** MERGE-style upsert: rows in `updates` replace current rows with the
    * same key; unmatched update rows are inserted. One atomic snapshot
    * swap — readers see the pre-merge or post-merge table, never a mix.
    * Plan shape at scale: a single shuffle of both sides on the key
    * columns (left-anti + union), no driver involvement; the rewrite is
    * proportional to the whole table like any copy-on-write MERGE —
    * partition-scoped merges can first narrow with a predicate.
    */
  def upsert(updates: DataFrame, keyCols: Seq[String]): Int = {
    import org.apache.spark.sql.functions.col
    val current = read()
    val merged = current
      .join(updates.select(keyCols.map(col): _*), keyCols, "left_anti")
      .unionByName(updates, allowMissingColumns = true)
      .localCheckpoint(true)
    overwrite(merged)
  }

  /** Expire all but the last `keepLast` snapshots and delete data files no
    * surviving snapshot references (orphan GC — reference T6). */
  def expireSnapshots(keepLast: Int): Unit = {
    val all = versions
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    val live = keep.flatMap(v => snapshot(v).files.map(_.path)).toSet
    val dead = drop.flatMap(v => snapshot(v).files.map(_.path)).toSet -- live
    dead.foreach(p => Files.deleteIfExists(Paths.get(p)))
    drop.foreach(v => Files.deleteIfExists(snapDir.resolve(f"v$v%05d.json")))
  }

  // ------------------------------------------------------------ internals

  /** Write df into an immutable staging dir; return its file manifest with
    * per-file row counts and min/max column stats (the Iceberg manifest
    * trick: one cheap distributed pass over the new files at commit time
    * buys metadata-only file skipping for every future query — at 100 TB
    * the planner prunes from the O(files) manifest instead of opening
    * footers). */
  private def stage(df: DataFrame): Seq[SnapshotTable.DataFile] = {
    import org.apache.spark.sql.functions._
    val dir = Paths.get(location, "data", java.util.UUID.randomUUID.toString)
    df.write.parquet(dir.toString)
    val paths = Files.list(dir).iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toSeq.sorted
    val statCols = df.schema.fields
      .filter(f => SnapshotTable.statType(f.dataType).nonEmpty)
      .take(8)
    val statsByFile: Map[String, (Long, Map[String, SnapshotTable.ColStats])] =
      if (statCols.isEmpty) Map.empty
      else {
        val aggs = count(lit(1)).as("__rows") +:
          statCols.flatMap(f => Seq(
            min(col(f.name)).cast("string").as(s"__min_${f.name}"),
            max(col(f.name)).cast("string").as(s"__max_${f.name}")))
        spark.read.parquet(dir.toString)
          .groupBy(input_file_name().as("__file"))
          .agg(aggs.head, aggs.tail: _*)
          .collect()
          .map { r =>
            val file = r.getString(0).stripPrefix("file://").stripPrefix("file:")
            val stats = statCols.flatMap { f =>
              val mn = r.getAs[String](s"__min_${f.name}")
              val mx = r.getAs[String](s"__max_${f.name}")
              if (mn == null || mx == null) None
              else Some(f.name -> SnapshotTable.ColStats(
                SnapshotTable.statType(f.dataType).get, mn, mx))
            }.toMap
            file -> (r.getAs[Long]("__rows"), stats)
          }.toMap
      }
    paths.map { p =>
      val (rows, stats) = statsByFile.getOrElse(p, (-1L, Map.empty[String, SnapshotTable.ColStats]))
      SnapshotTable.DataFile(p, rows, stats)
    }
  }

  private def commitWithRetry(
      nextFiles: SnapshotTable.Snapshot => Seq[SnapshotTable.DataFile],
      schemaJson: String, operation: String, attempts: Int = 20): Int = {
    var tries = 0
    while (true) {
      val baseV = latestVersion
      val base =
        if (baseV >= 0) snapshot(baseV)
        else SnapshotTable.Snapshot(-1, 0L, schemaJson, Seq.empty, "none")
      val snap = SnapshotTable.Snapshot(
        baseV + 1, System.currentTimeMillis(), schemaJson,
        nextFiles(base), operation)
      Files.createDirectories(snapDir)
      val tmp = Files.createTempFile(snapDir, ".tmp-", ".json")
      Files.writeString(tmp, SnapshotTable.renderSnapshot(snap))
      try {
        // createLink is atomic create-if-absent (POSIX link()); a plain
        // ATOMIC_MOVE would silently REPLACE an existing version file,
        // letting a concurrent committer's snapshot be lost
        Files.createLink(snapDir.resolve(f"v${snap.version}%05d.json"), tmp)
        Files.deleteIfExists(tmp)
        return snap.version
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp)
          tries += 1
          if (tries >= attempts)
            throw new IllegalStateException(
              s"commit to $location lost $attempts races, giving up")
        // retry on top of the newly committed snapshot
      }
    }
    -1 // unreachable
  }
}

object SnapshotTable {

  /** Per-column min/max, stored as strings with a type tag
    * (`long` | `double` | `string`) for comparison at prune time. */
  case class ColStats(typ: String, min: String, max: String)

  case class DataFile(path: String, rows: Long,
      stats: Map[String, ColStats] = Map.empty)

  case class Snapshot(version: Int, timestampMs: Long, schemaJson: String,
      files: Seq[DataFile], operation: String)

  /** Stats-eligible types (timestamps excluded in v1: their string forms
    * don't compare reliably across fraction lengths). */
  private[table] def statType(dt: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case LongType | IntegerType | ShortType | ByteType => Some("long")
      case DoubleType | FloatType => Some("double")
      case StringType => Some("string")
      case _ => None
    }
  }

  private val SnapName = "v([0-9]{5})\\.json".r

  /** Create a new table at `location` with `df` as snapshot v0. */
  def create(spark: SparkSession, location: String, df: DataFrame): SnapshotTable = {
    val t = new SnapshotTable(spark, location)
    require(t.latestVersion < 0, s"table already exists at $location")
    t.append(df)
    t
  }

  /** Create an empty table with a declared schema (SQL CREATE TABLE). */
  def createEmpty(spark: SparkSession, location: String,
      schema: org.apache.spark.sql.types.StructType): SnapshotTable = {
    val t = new SnapshotTable(spark, location)
    require(t.latestVersion < 0, s"table already exists at $location")
    t.commitEmpty(schema.json)
    t
  }

  /** Open an existing table. */
  def load(spark: SparkSession, location: String): SnapshotTable = {
    val t = new SnapshotTable(spark, location)
    require(t.latestVersion >= 0, s"no snapshot log at $location")
    t
  }

  // Minimal JSON codec (Jackson via Spark's bundled jars; the snapshot
  // document is our own format, so no external schema to honor).
  import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
  import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
  private val mapper = new ObjectMapper()

  private[table] def renderSnapshot(s: Snapshot): String = {
    val root: ObjectNode = mapper.createObjectNode()
    root.put("version", s.version)
    root.put("timestampMs", s.timestampMs)
    root.put("schemaJson", s.schemaJson)
    root.put("operation", s.operation)
    val arr: ArrayNode = root.putArray("files")
    s.files.foreach { f =>
      val o = arr.addObject()
      o.put("path", f.path)
      o.put("rows", f.rows)
      if (f.stats.nonEmpty) {
        val st = o.putObject("stats")
        f.stats.toSeq.sortBy(_._1).foreach { case (c, cs) =>
          val n = st.putObject(c)
          n.put("t", cs.typ); n.put("min", cs.min); n.put("max", cs.max)
        }
      }
    }
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  private[table] def parseSnapshot(json: String): Snapshot = {
    val n: JsonNode = mapper.readTree(json)
    val files = n.get("files").elements().asScala
      .map { f =>
        val stats =
          if (f.has("stats")) {
            val st = f.get("stats")
            st.fieldNames().asScala.map { c =>
              val cn = st.get(c)
              c -> ColStats(cn.get("t").asText(), cn.get("min").asText(),
                cn.get("max").asText())
            }.toMap
          } else Map.empty[String, ColStats]
        DataFile(f.get("path").asText(), f.get("rows").asLong(), stats)
      }
      .toSeq
    Snapshot(n.get("version").asInt(), n.get("timestampMs").asLong(),
      n.get("schemaJson").asText(), files, n.get("operation").asText())
  }
}
