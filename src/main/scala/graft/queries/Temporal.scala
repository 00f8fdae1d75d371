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

  // ------------------------------------------------------------- q81
  // Gap-based sessionization (30-min inactivity gap): the lag/cumsum
  // rewrite — flag rows that open a session (no predecessor within the
  // gap), running-sum the flags into session ordinals, aggregate. One
  // shuffle on user_id; ties broken by event_id so the fold is
  // deterministic under timestamp collisions. Same shape Structured
  // Streaming uses for session windows; this is the batch formulation.
  def q81(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val run = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events(s, dir)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > 1800000000L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum("new_session").over(run))
      .groupBy("user_id", "session_idx")
      .agg(count(lit(1)).as("n_events"),
        min("ts").as("session_start"), max("ts").as("session_end"),
        (max(unix_micros(col("ts"))) - min(unix_micros(col("ts"))))
          .as("duration_us"))
      .orderBy("user_id", "session_idx")
  }

  val q81Sql =
    """WITH l AS (
      |  SELECT user_id, event_id, ts,
      |         lag(epoch_us(ts)) OVER (PARTITION BY user_id
      |                                 ORDER BY ts, event_id) AS prev_us
      |  FROM events),
      |f AS (
      |  SELECT user_id, event_id, ts,
      |         CASE WHEN prev_us IS NULL
      |                   OR epoch_us(ts) - prev_us > 1800000000 THEN 1
      |              ELSE 0 END AS new_session
      |  FROM l),
      |x AS (
      |  SELECT user_id, ts,
      |         CAST(sum(new_session) OVER (PARTITION BY user_id
      |           ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS BIGINT) AS session_idx
      |  FROM f)
      |SELECT user_id, session_idx, count(*) AS n_events,
      |       min(ts) AS session_start, max(ts) AS session_end,
      |       max(epoch_us(ts)) - min(epoch_us(ts)) AS duration_us
      |FROM x GROUP BY user_id, session_idx
      |ORDER BY user_id, session_idx""".stripMargin

  // ------------------------------------------------------------- q82
  // Retention cohort matrix: users cohorted by first-activity date,
  // counted on each later active day by day offset. Three aggregations,
  // each keyed by something that grows with the data (user×day, user,
  // cohort×offset) — the standard product-analytics rollup at any scale.
  def q82(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val userDays = ev.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val cohorts = userDays.groupBy("user_id").agg(min("day").as("cohort_day"))
    userDays.join(cohorts, "user_id")
      .withColumn("day_offset", datediff(col("day"), col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct("user_id").as("n_users"))
      .filter(col("day_offset") <= 14)
      .orderBy("cohort_day", "day_offset")
  }

  val q82Sql =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |c AS (
      |  SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
      |SELECT c.cohort_day, CAST(ud.day - c.cohort_day AS BIGINT) AS day_offset,
      |       count(DISTINCT ud.user_id) AS n_users
      |FROM ud JOIN c ON ud.user_id = c.user_id
      |WHERE ud.day - c.cohort_day <= 14
      |GROUP BY c.cohort_day, CAST(ud.day - c.cohort_day AS BIGINT)
      |ORDER BY cohort_day, day_offset""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q79_asof_join" -> (q79 _),
    "q80_range_join" -> (q80 _),
    "q81_sessionize" -> (q81 _),
    "q82_retention_cohorts" -> (q82 _))

  val oracle: Map[String, String] = Map(
    "q79_asof_join" -> q79Sql,
    "q80_range_join" -> q80Sql,
    "q81_sessionize" -> q81Sql,
    "q82_retention_cohorts" -> q82Sql)
}
