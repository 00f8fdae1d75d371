package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hot/cold tiering (reference T9,
  * `aws-community-builders-presentation.md:717-731,934-953`): a 30-day
  * boundary splits the event stream into a hot tier (fast storage /
  * Snowflake-native in the reference) and a cold tier (cheap object
  * storage), with a UNION ALL view giving unified query access.
  *
  * The migration job is a filtered rewrite through the snapshot-table
  * committer: cold gains an appended snapshot, hot is atomically
  * overwritten with only the recent rows — readers of either tier see a
  * consistent snapshot throughout, and the pre-migration hot snapshot
  * remains time-travelable until expired.
  */
object Tiering {

  /** Move rows with ts < boundary from hot to cold; returns (hot, cold). */
  def migrate(spark: SparkSession, hotLoc: String, coldLoc: String,
      boundary: String): (SnapshotTable, SnapshotTable) = {
    val hot = SnapshotTable.load(spark, hotLoc)
    val b = lit(boundary).cast("timestamp")
    val current = hot.read()
    val toCold = current.filter(col("ts") < b).localCheckpoint(true)
    val keepHot = current.filter(col("ts") >= b).localCheckpoint(true)
    val cold =
      if (new java.io.File(s"$coldLoc/_snapshots").isDirectory) {
        val c = SnapshotTable.load(spark, coldLoc); c.append(toCold); c
      } else SnapshotTable.create(spark, coldLoc, toCold)
    hot.overwrite(keepHot)
    (hot, cold)
  }

  /** Unified hot ∪ cold view (U1), registered under `viewName`. */
  def unifiedView(spark: SparkSession, hotLoc: String, coldLoc: String,
      viewName: String): DataFrame = {
    val u = SnapshotTable.load(spark, hotLoc).read()
      .withColumn("tier", lit("hot"))
      .unionByName(SnapshotTable.load(spark, coldLoc).read()
        .withColumn("tier", lit("cold")))
    u.createOrReplaceTempView(viewName)
    u
  }
}
