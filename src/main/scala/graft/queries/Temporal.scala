package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.TemporalJoin

/** Temporal-join queries over `events`: as-of join and windowed range
  * join — the two event-time operators Spark lacks natively, run through
  * [[graft.operators.TemporalJoin]]'s shuffle-minimal formulations. The
  * DuckDB oracles use the engine's native ASOF JOIN / inequality join, so
  * the compare pins our distributed rewrites against a reference
  * implementation of the semantics, not against themselves.
  */
object Temporal {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  // ------------------------------------------------------------- q79
  // As-of join: each event annotated with the user's most recent purchase
  // at-or-before the event. Right side pre-aggregated to one row per
  // (user_id, ts) so the carried value is well-defined under timestamp
  // collisions. One exchange on user_id; no join node (union + running
  // last) — at 100 TB this is a single shuffle of events, no hot-key
  // explosion.
  def q79(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy("user_id", "ts")
      .agg(max("value").as("purchase_value"))
    TemporalJoin.asofBackward(
        ev.select("event_id", "user_id", "ts", "event_type"),
        purchases.withColumnRenamed("ts", "pts")
          .select(col("user_id"), col("pts").as("ts"), col("purchase_value"),
            col("pts")),
        key = "user_id", time = "ts",
        carry = Seq("pts", "purchase_value"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("asof_pts").as("last_purchase_ts"),
        round(col("asof_purchase_value"), 4).as("last_purchase_value"))
      .orderBy("event_id")
  }

  val q79Sql =
    """WITH p AS (
      |  SELECT user_id, ts, max(value) AS purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
      |SELECT e.event_id, e.user_id, e.event_type,
      |       p.ts AS last_purchase_ts,
      |       round(p.purchase_value, 4) AS last_purchase_value
      |FROM events e
      |ASOF LEFT JOIN p ON e.user_id = p.user_id AND e.ts >= p.ts
      |ORDER BY e.event_id""".stripMargin

  // ------------------------------------------------------------- q80
  // Windowed range join: for every purchase, how many events the same
  // user produced in the 5 minutes before it. Bucketed equi-join on
  // (user_id, floor(epoch/300)) with a 2-bucket probe per anchor — the
  // inequality predicate is only a residual filter on hash-join matches,
  // never a nested-loop join condition.
  def q80(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    TemporalJoin.countPreceding(
        left = ev.select("user_id", "ts"),
        anchors = ev.filter(col("event_type") === "purchase")
          .select("event_id", "user_id", "ts"),
        key = "user_id", time = "ts", anchorId = "event_id",
        windowSec = 300L)
      .select(col("event_id"), col("user_id"), col("n_in_window"))
      .orderBy("event_id")
  }

  val q80Sql =
    """WITH p AS (
      |  SELECT event_id, user_id, ts FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id, count(e.ts) AS n_in_window
      |FROM p LEFT JOIN events e
      |  ON e.user_id = p.user_id
      | AND e.ts >= p.ts - INTERVAL 5 MINUTE AND e.ts < p.ts
      |GROUP BY p.event_id, p.user_id
      |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_asof_join" -> (q79 _),
    "q80_range_join" -> (q80 _))

  val oracle: Map[String, String] = Map(
    "q79_asof_join" -> q79Sql,
    "q80_range_join" -> q80Sql)
}
