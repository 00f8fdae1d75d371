package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-partitioned join: two graft tables identity-partitioned the
  * same way must join with NO shuffle when the v2 bucketing conf is on
  * (the DSv2 co-partitioning path; a 100 TB fact-fact join's shuffle is
  * its dominant cost). Runs in its OWN SparkSession: the bucketing conf
  * changes which scan class every graft table builds, and suites share
  * one session — flipping it globally would race concurrently-running
  * suites that inspect scan internals. */
class KeyGroupedJoinSpec extends SparkFunSuite {

  // newSession() clones the conf but shares the SparkContext, so the
  // grouping flags are visible only to this suite
  private lazy val s2: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.graft.planning.preserveDataGrouping", "true")
    s
  }

  private def mkTable(s: SparkSession, cat: String, name: String): Unit = {
    s.sql(
      s"""CREATE TABLE $cat.db.$name
         |  (event_id BIGINT, day DATE, value DOUBLE)
         |PARTITIONED BY (day)""".stripMargin)
    graft.Tables.load(s, sf, "events")
      .select(col("event_id"), to_date(col("ts")).as("day"), col("value"))
      .writeTo(s"$cat.db.$name").append()
  }

  private def shuffles(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        shuffles(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffles(s.plan)
    }.sum

  private def expectedRows(s: SparkSession): Long = {
    val d = graft.Tables.load(s, sf, "events")
      .groupBy(to_date(col("ts")).as("day")).count()
    d.agg(sum(col("count") * col("count"))).head().getLong(0)
  }

  test("same-partitioned graft tables join with zero shuffles under SPJ") {
    val wh = scratch("spj-wh")
    s2.conf.set("spark.sql.catalog.spjx", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.spjx.warehouse", wh)
    mkTable(s2, "spjx", "ev_a")
    mkTable(s2, "spjx", "ev_b")

    val joined = s2.table("spjx.db.ev_a").as("a")
      .join(s2.table("spjx.db.ev_b").as("b"), "day")
    assert(joined.count() == expectedRows(s2))
    // groupBy("day") after the join also needs no exchange — the join
    // output is already day-partitioned
    val agg = s2.table("spjx.db.ev_a").as("a")
      .join(s2.table("spjx.db.ev_b").as("b"), "day")
      .groupBy("day").count()
    val rows = agg.collect()
    assert(rows.length >= 25)
    val nShuffles = shuffles(agg.queryExecution.executedPlan)
    assert(nShuffles == 0,
      s"expected a shuffle-free storage-partitioned join, found $nShuffles exchanges:\n" +
        agg.queryExecution.executedPlan)
  }

  test("SPJ off → same join still correct (runtime-filter scan path)") {
    val wh = scratch("spj-off-wh")
    spark.conf.set("spark.sql.catalog.spjy", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjy.warehouse", wh)
    mkTable(spark, "spjy", "ev_a")
    mkTable(spark, "spjy", "ev_b")
    val n = spark.table("spjy.db.ev_a")
      .join(spark.table("spjy.db.ev_b"), "day").count()
    assert(n == expectedRows(spark))
  }
}
