package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Edge semantics of the temporal joins: equal-timestamp inclusivity,
  * missing-match nulls, and exact window boundaries — the cases a
  * hash-compare at sf0.01 covers only if the data happens to produce
  * them.
  */
class TemporalJoinSpec extends SparkFunSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asofBackward: inclusive at equal time, null before first right row") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any right row
      (2L, 10L, ts("2024-01-01 00:01:00")), // equal to right row -> matches it
      (3L, 10L, ts("2024-01-01 00:02:00")), // after -> still the 00:01 row
      (4L, 20L, ts("2024-01-01 00:05:00"))  // other key, no right rows at all
    ).toDF("id", "k", "t")
    val right = Seq(
      (10L, ts("2024-01-01 00:01:00"), 42.0)
    ).toDF("k", "t", "v")
    val out = TemporalJoin.asofBackward(left, right, "k", "t", Seq("v"))
      .orderBy("id").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("asof_v")))
    assert(out(1).getAs[Double]("asof_v") == 42.0)
    assert(out(2).getAs[Double]("asof_v") == 42.0)
    assert(out(3).isNullAt(out(3).fieldIndex("asof_v")))
  }

  test("asofBackward: carries the latest of several right rows") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 00:10:00"))).toDF("id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 00:01:00"), 1.0),
      (1L, ts("2024-01-01 00:05:00"), 2.0),
      (1L, ts("2024-01-01 00:11:00"), 3.0) // in the future: invisible
    ).toDF("k", "t", "v")
    val out = TemporalJoin.asofBackward(left, right, "k", "t", Seq("v")).collect()
    assert(out.head.getAs[Double]("asof_v") == 2.0)
  }

  test("countPreceding: half-open [t-300, t) window, exact boundaries") {
    import spark.implicits._
    val events = Seq(
      (1L, ts("2024-01-01 00:00:00")), // == t-300: INCLUDED
      (1L, ts("2024-01-01 00:02:30")), // inside
      (1L, ts("2024-01-01 00:05:00")), // == t: EXCLUDED (strict <)
      (1L, ts("2023-12-31 23:59:59.999")), // just before t-300: excluded
      (2L, ts("2024-01-01 00:03:00"))  // other key: excluded
    ).toDF("k", "t")
    val anchors = Seq((100L, 1L, ts("2024-01-01 00:05:00")),
      (200L, 2L, ts("2024-01-01 00:20:00"))).toDF("aid", "k", "t")
    val out = TemporalJoin.countPreceding(events, anchors, "k", "t", "aid", 300L)
      .orderBy("aid").collect()
    assert(out(0).getAs[Long]("n_in_window") == 2L)
    assert(out(1).getAs[Long]("n_in_window") == 0L) // empty window kept as 0
  }

  test("q79/q80 run at sf0.001 and annotate every event exactly once") {
    val q79 = graft.queries.Temporal.q79(spark, sf)
    val n = graft.Tables.load(spark, sf, "events").count()
    assert(q79.count() == n) // as-of never drops or duplicates left rows
    val q80 = graft.queries.Temporal.q80(spark, sf)
    val purchases = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(q80.count() == purchases)
  }
}
