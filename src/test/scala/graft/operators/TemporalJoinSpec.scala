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

  test("asofBackward: NULL field in the newest right row carries as NULL (no backfill from older rows)") {
    import spark.implicits._
    val left = Seq((1L, 1L, ts("2024-01-01 00:10:00"))).toDF("id", "k", "t")
    val right = Seq(
      (1L, ts("2024-01-01 00:01:00"), Option(5.0)),
      (1L, ts("2024-01-01 00:05:00"), Option.empty[Double]) // newest: v IS NULL
    ).toDF("k", "t", "v")
    val out = TemporalJoin.asofBackward(left, right, "k", "t", Seq("t", "v"))
      .collect().head
    // the 00:05 row wins atomically: its timestamp AND its null value —
    // per-column last(ignoreNulls) would produce a 00:05/5.0 chimera
    assert(out.getAs[Timestamp]("asof_t") == ts("2024-01-01 00:05:00"))
    assert(out.isNullAt(out.fieldIndex("asof_v")))
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

  test("q81 sessions: exact 30-min gap does NOT split; >30min does") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // replicate q81's core on a controlled frame via the same expressions
    val ev = Seq(
      (1L, 1L, ts("2024-01-01 00:00:00")),
      (2L, 1L, ts("2024-01-01 00:30:00")),  // exactly 30 min: same session
      (3L, 1L, ts("2024-01-01 01:00:00.000001")), // 30min+1us: new session
      (4L, 2L, ts("2024-01-01 05:00:00"))
    ).toDF("event_id", "user_id", "ts")
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = ev
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(run))
      .select("event_id", "session_idx").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sess(1L) == 1L && sess(2L) == 1L) // same session across exact gap
    assert(sess(3L) == 2L)                   // split on gap + 1us
    assert(sess(4L) == 1L)                   // per-user ordinals restart
  }

  test("q81/q82 at sf0.001: session event counts cover all events; cohort day-0 is max") {
    val q81 = graft.queries.Temporal.q81(spark, sf)
    val n = graft.Tables.load(spark, sf, "events").count()
    assert(q81.agg(sum("n_events")).head().getLong(0) == n)
    assert(q81.filter(col("duration_us") < 0).count() == 0)
    val q82 = graft.queries.Temporal.q82(spark, sf).collect()
    q82.groupBy(_.getAs[java.sql.Date]("cohort_day")).foreach { case (_, g) =>
      val byOff = g.map(r => r.getAs[Long]("day_offset") -> r.getAs[Long]("n_users")).toMap
      assert(byOff.keys.forall(_ >= 0))
      // day-0 row exists and no later offset exceeds the cohort size
      assert(byOff.contains(0L))
      assert(byOff.values.forall(_ <= byOff(0L)))
    }
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
