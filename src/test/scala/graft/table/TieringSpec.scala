package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class TieringSpec extends SparkFunSuite {

  test("tier migration preserves the union and splits on the boundary") {
    val events = graft.Tables.load(spark, sf, "events")
    val hotLoc = scratch("tier-hot")
    val coldLoc = scratch("tier-cold")
    SnapshotTable.create(spark, hotLoc, events)
    val boundary = graft.Tables.daysAgo(7)

    val (hot, cold) = Tiering.migrate(spark, hotLoc, coldLoc, boundary)
    val b = lit(boundary).cast("timestamp")
    assert(hot.read().filter(col("ts") < b).count() == 0)
    assert(cold.read().filter(col("ts") >= b).count() == 0)

    val unified = Tiering.unifiedView(spark, hotLoc, coldLoc, "tier_test_view")
    assert(unified.count() == events.count())
    assert(spark.table("tier_test_view")
      .groupBy("tier").count().count() == 2)
    // pre-migration hot snapshot still time-travelable
    assert(hot.readVersion(0).count() == events.count())
  }
}
