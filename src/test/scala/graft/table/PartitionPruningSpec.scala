package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The q55 shape end-to-end: a day-partitioned catalog table over the
  * events data must scan only the partitions a day predicate selects. */
class PartitionPruningSpec extends SparkFunSuite {

  test("day-partitioned events table prunes non-matching partitions") {
    val wh = scratch("ppx-wh")
    spark.conf.set("spark.sql.catalog.ppx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ppx.warehouse", wh)
    spark.sql(
      """CREATE TABLE ppx.db.ev_days
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, day DATE, value DOUBLE)
        |PARTITIONED BY (day)""".stripMargin)
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"), col("value"))
      .writeTo("ppx.db.ev_days").append()

    val t = SnapshotTable.load(spark, s"$wh/db/ev_days")
    val nDays = t.snapshot(t.latestVersion).files
      .flatMap(_.stats.get("day").map(_.min)).distinct.size
    assert(nDays >= 25, s"expected ~30 day partitions, got $nDays")

    def scanned(sql: String): Int =
      spark.sql(sql).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          b.scan.asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScan]
            .fileIndex.inputFiles.length
      }.sum

    val all = scanned("SELECT * FROM ppx.db.ev_days")
    val oneDay = scanned("SELECT * FROM ppx.db.ev_days WHERE day = DATE '2024-01-05'")
    val week = scanned(
      "SELECT * FROM ppx.db.ev_days WHERE day >= DATE '2024-01-24'")
    assert(oneDay * 10 <= all, s"one-day scan should touch ~1/30 of files: $oneDay of $all")
    assert(week < all / 2, s"one-week scan should prune most files: $week of $all")

    // pruned results stay correct
    val viaTable = spark.sql(
      "SELECT count(*) FROM ppx.db.ev_days WHERE day = DATE '2024-01-05'")
      .head().getLong(0)
    val direct = graft.Tables.load(spark, sf, "events")
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(viaTable == direct)
  }
}
