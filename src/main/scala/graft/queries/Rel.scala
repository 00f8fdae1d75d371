package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Relational-completeness operators beyond the reference's declared query
  * corpus — the SQL surface a user switching engines reaches for next:
  * PIVOT, ROLLUP subtotals, semi/anti joins, and set operations. Each is
  * the built-in Catalyst operator (pivot → one hash agg with conditional
  * counters, rollup → Expand + hash agg, semi/anti → LeftSemi/LeftAnti
  * join, set ops → hash aggregate/join) — no driver-side reshaping, so the
  * 100 TB story is the same as any GROUP BY/JOIN: one shuffle keyed by
  * something that grows with the data.
  */
object Rel {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ------------------------------------------------------------- q84
  // PIVOT: order counts per market segment, one column per order
  // priority. The value list is pinned explicitly — Spark then plans ONE
  // aggregation pass with conditional counters (an unpinned pivot would
  // first run a distinct scan to discover values, a second job).
  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  def q84(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .pivot("o_orderpriority", Priorities)
      .agg(count(lit(1)))
      .na.fill(0L, Priorities)
      .orderBy("c_mktsegment")

  val q84Sql =
    """SELECT c_mktsegment,
      |       count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS "1-URGENT",
      |       count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS "2-HIGH",
      |       count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS "3-MEDIUM",
      |       count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS "4-NOT SPECIFIED",
      |       count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS "5-LOW"
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------- q85
  // ROLLUP: event counts by (event_type, day) with per-type subtotals and
  // a grand total in one pass (Catalyst Expand: each input row fans into
  // its grouping sets before ONE hash agg — not three scans). The NULL
  // markers are unambiguous because both grouping columns are non-null in
  // the data.
  def q85(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("day", to_date(col("ts")))
      .rollup("event_type", "day")
      // DECIMAL(18,2) accumulate: a raw double sum is order-dependent and
      // the grand-total row sums the whole table — the repo-wide device
      // for cross-engine-exact value sums (same as Ops.dsum)
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy(col("event_type").asc_nulls_first, col("day").asc_nulls_first)

  val q85Sql =
    """SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY ROLLUP(event_type, CAST(ts AS DATE))
      |ORDER BY event_type NULLS FIRST, day NULLS FIRST""".stripMargin

  // ------------------------------------------------------------- q86
  // Semi/anti joins: per segment, customers WITH at least one order
  // (LeftSemi — no fan-out, the probe side never duplicates) and WITHOUT
  // any (LeftAnti), reported side by side. The idiomatic plan for
  // EXISTS / NOT EXISTS — a plain join + distinct would shuffle the
  // orders fan-out just to throw it away.
  def q86(s: SparkSession, dir: String): DataFrame = {
    val customer = t(s, dir, "customer")
    val orders = t(s, dir, "orders").select(col("o_custkey").as("c_custkey"))
    val withO = customer.join(orders, Seq("c_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("with_orders"))
    val withoutO = customer.join(orders, Seq("c_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("without_orders"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("with_orders"), lit(0L)).as("with_orders"),
        coalesce(col("without_orders"), lit(0L)).as("without_orders"))
      .orderBy("c_mktsegment")
  }

  val q86Sql =
    """SELECT c_mktsegment,
      |       count(CASE WHEN EXISTS (SELECT 1 FROM orders
      |                               WHERE o_custkey = c_custkey)
      |             THEN 1 END) AS with_orders,
      |       count(CASE WHEN NOT EXISTS (SELECT 1 FROM orders
      |                                   WHERE o_custkey = c_custkey)
      |             THEN 1 END) AS without_orders
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------- q87
  // Set operations with SQL DISTINCT semantics: users who viewed AND
  // purchased (INTERSECT), viewed but NEVER purchased (EXCEPT), plus
  // UNION cardinality — the audience-overlap shapes. Catalyst plans
  // intersect/except as semi/anti joins over pre-aggregated sides. The
  // three branches stay in ONE lazy plan (no driver-side count() jobs):
  // the plan guard and the bench's plan metrics see the real joins, and
  // the scans are shareable by the optimizer.
  def q87(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    def users(typ: String) =
      ev.filter(col("event_type") === typ).select("user_id")
    def branch(label: String, df: DataFrame) =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(label).as("audience"), col("n_users"))
    branch("view_and_purchase", users("view").intersect(users("purchase")))
      .unionAll(branch("view_never_purchase",
        users("view").except(users("purchase"))))
      .unionAll(branch("view_or_purchase",
        users("view").union(users("purchase")).distinct()))
      .orderBy("audience")
  }

  val q87Sql =
    """SELECT 'view_and_purchase' AS audience, count(*) AS n_users FROM (
      |  SELECT user_id FROM events WHERE event_type = 'view'
      |  INTERSECT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT 'view_never_purchase', count(*) FROM (
      |  SELECT user_id FROM events WHERE event_type = 'view'
      |  EXCEPT
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |UNION ALL
      |SELECT 'view_or_purchase', count(*) FROM (
      |  SELECT user_id FROM events WHERE event_type = 'view'
      |  UNION
      |  SELECT user_id FROM events WHERE event_type = 'purchase')
      |ORDER BY audience""".stripMargin

  // ------------------------------------------------------------- q89
  // Explicit window frames (the reference's windows all use the default
  // frame): daily event totals with a 7-row trailing moving average and a
  // running cumulative sum. ROWS frames are position-based, so the result
  // is engine-portable as long as the ordering is total (day is unique
  // after the aggregate).
  def q89(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val mov = Window.orderBy("day").rowsBetween(-6, Window.currentRow)
    val cum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "events")
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("day"), col("n_events"),
        round(avg("n_events").over(mov), 4).as("ma7"),
        sum("n_events").over(cum).as("running_total"))
      .orderBy("day")
  }

  val q89Sql =
    """WITH d AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
      |  FROM events GROUP BY 1)
      |SELECT day, n_events,
      |       round(avg(n_events) OVER (ORDER BY day
      |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7,
      |       CAST(sum(n_events) OVER (ORDER BY day
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |         AS BIGINT) AS running_total
      |FROM d ORDER BY day""".stripMargin

  // ------------------------------------------------------------- q90
  // Ranking suite beyond ROW_NUMBER (the only ranker the reference uses):
  // percent_rank and ntile quartiles of customers by account balance per
  // segment. The ordering is made TOTAL with the custkey tie-break —
  // ntile assigns positionally, so under ties its split would otherwise
  // be engine-dependent.
  def q90(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    t(s, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        ntile(4).over(w).as("quartile"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  val q90Sql =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |       round(percent_rank() OVER (PARTITION BY c_mktsegment
      |         ORDER BY c_acctbal DESC, c_custkey), 6) AS pct_rank,
      |       ntile(4) OVER (PARTITION BY c_mktsegment
      |         ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |FROM customer ORDER BY c_mktsegment, c_custkey""".stripMargin

  // ------------------------------------------------------------- q91
  // UNPIVOT (melt): the q84 wide pivot folded back to long form. The
  // oracle is the DIRECT long-form aggregation, so the compare pins the
  // pivot→unpivot roundtrip as the identity it should be (zero-filled
  // cells are dropped on both sides).
  def q91(s: SparkSession, dir: String): DataFrame =
    q84(s, dir)
      .unpivot(Array(col("c_mktsegment")),
        Priorities.map(col).toArray, "o_orderpriority", "n_orders")
      .filter(col("n_orders") > 0)
      .orderBy("c_mktsegment", "o_orderpriority")

  val q91Sql =
    """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment, o_orderpriority
      |HAVING count(*) > 0
      |ORDER BY c_mktsegment, o_orderpriority""".stripMargin

  // ------------------------------------------------------------- q92
  // Correlated scalar subquery: each customer's maximum order value,
  // written as the subquery a SQL user would write — Catalyst
  // decorrelates it (RewriteCorrelatedScalarSubquery) into a left outer
  // join over a pre-aggregated orders side, which is exactly the plan
  // you'd hand-write at 100 TB. Customers with no orders surface as NULL.
  def q92(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("customer_v")
    t(s, dir, "orders").createOrReplaceTempView("orders_v")
    s.sql(
      """SELECT c_custkey, c_mktsegment,
        |       (SELECT max(o_totalprice) FROM orders_v
        |        WHERE o_custkey = c_custkey) AS max_order
        |FROM customer_v ORDER BY c_custkey""".stripMargin)
  }

  val q92Sql =
    """SELECT c_custkey, c_mktsegment,
      |       (SELECT max(o_totalprice) FROM orders
      |        WHERE o_custkey = c_custkey) AS max_order
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ------------------------------------------------------------- q93
  // Recursive CTE (new in Spark 4.x): a dense date spine generated
  // recursively, left-joined to the sparse daily purchase counts — the
  // gap-filling calendar every reporting layer needs (days with zero
  // purchases MUST appear). The spine is tiny and driver-independent;
  // the fact side stays a normal aggregate.
  def q93(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "events").createOrReplaceTempView("events_v")
    s.sql(
      """WITH RECURSIVE spine (day) AS (
        |  SELECT DATE '2024-01-01'
        |  UNION ALL
        |  SELECT date_add(day, 1) FROM spine WHERE day < DATE '2024-01-30'
        |),
        |daily AS (
        |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases
        |  FROM events_v WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT spine.day, coalesce(daily.n_purchases, 0) AS n_purchases
        |FROM spine LEFT JOIN daily ON spine.day = daily.day
        |ORDER BY spine.day""".stripMargin)
  }

  val q93Sql =
    """WITH RECURSIVE spine (day) AS (
      |  SELECT DATE '2024-01-01' AS day
      |  UNION ALL
      |  SELECT day + 1 FROM spine WHERE day < DATE '2024-01-30'
      |),
      |daily AS (
      |  SELECT CAST(ts AS DATE) AS day, count(*) AS n_purchases
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1)
      |SELECT spine.day, coalesce(daily.n_purchases, 0) AS n_purchases
      |FROM spine LEFT JOIN daily ON spine.day = daily.day
      |ORDER BY spine.day""".stripMargin

  // ------------------------------------------------------------- q95
  // Bitmap distinct-count ([[graft.functions.BitmapDistinct]], the
  // TypedImperativeAggregate exemplar): exact distinct users per event
  // type through a mergeable bitmap buffer — partial aggregation ORs
  // bitmaps map-side, so the shuffle carries one bitmap per group instead
  // of one row per distinct (user, group) pair. EXACT, so the oracle is
  // plain count(DISTINCT) — a bitmap bug is a hash mismatch, not a
  // tolerance judgment.
  def q95(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.install(s)
    t(s, dir, "events")
      .groupBy("event_type")
      .agg(expr("bitmap_distinct(user_id)").as("distinct_users"),
        count(lit(1)).as("n_events"))
      .orderBy("event_type")
  }

  val q95Sql =
    """SELECT event_type, count(DISTINCT user_id) AS distinct_users,
      |       count(*) AS n_events
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ------------------------------------------------------------- q99
  // CUBE: event counts by (event_type, month) with subtotals along BOTH
  // axes plus the grand total — the same single Expand + hash-agg plan as
  // ROLLUP (q85), just with all four grouping sets, so the 100 TB cost is
  // one shuffle at 4× the input rows (Expand fan-out), not four scans.
  // The explicit GROUPING SETS API is pinned equivalent in RelSpec
  // (cube == groupingSets({(t,m),(t),(m),()})); NULL markers are
  // unambiguous because both grouping columns are non-null in the data.
  def q99(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .withColumn("month", month(col("ts")).cast("long"))
      .cube("event_type", "month")
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy(col("event_type").asc_nulls_first, col("month").asc_nulls_first)

  val q99Sql =
    """SELECT event_type, month(ts) AS month, count(*) AS n_events,
      |       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events
      |GROUP BY CUBE(event_type, month(ts))
      |ORDER BY event_type NULLS FIRST, month NULLS FIRST""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q99_cube" -> (q99 _),
    "q95_bitmap_distinct" -> (q95 _),
    "q92_correlated_subquery" -> (q92 _),
    "q93_recursive_cte" -> (q93 _),
    "q84_pivot" -> (q84 _),
    "q85_rollup" -> (q85 _),
    "q86_semi_anti" -> (q86 _),
    "q87_set_ops" -> (q87 _),
    "q89_window_frames" -> (q89 _),
    "q90_rank_suite" -> (q90 _),
    "q91_unpivot" -> (q91 _))

  val oracle: Map[String, String] = Map(
    "q99_cube" -> q99Sql,
    "q95_bitmap_distinct" -> q95Sql,
    "q92_correlated_subquery" -> q92Sql,
    "q93_recursive_cte" -> q93Sql,
    "q84_pivot" -> q84Sql,
    "q85_rollup" -> q85Sql,
    "q86_semi_anti" -> q86Sql,
    "q87_set_ops" -> q87Sql,
    "q89_window_frames" -> q89Sql,
    "q90_rank_suite" -> q90Sql,
    "q91_unpivot" -> q91Sql)
}
