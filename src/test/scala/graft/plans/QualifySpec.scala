package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class QualifySpec extends SparkFunSuite {

  test("passthrough when no QUALIFY present") {
    val sql = "SELECT a FROM t WHERE b > 1 ORDER BY a"
    assert(Qualify.desugar(sql) == sql)
  }

  test("QUALIFY inside string literal or subquery is not rewritten") {
    val s1 = "SELECT 'QUALIFY x' AS lit FROM t"
    assert(Qualify.desugar(s1) == s1)
    val s2 = "SELECT * FROM (SELECT a FROM t) x WHERE a > 1"
    assert(Qualify.desugar(s2) == s2)
  }

  test("basic desugar moves predicate to outer query") {
    val out = Qualify.desugar(
      "SELECT a, row_number() OVER (ORDER BY a) AS rn FROM t QUALIFY rn <= 3 ORDER BY a")
    assert(out.contains("__qualify WHERE rn <= 3"))
    assert(out.trim.endsWith("ORDER BY a"))
  }

  test("QUALIFY rewrite is semantically equivalent to window + filter") {
    val e = graft.Tables.load(spark, sf, "events")
    e.createOrReplaceTempView("events")
    val viaSql = spark.sql(Qualify.desugar(
      """SELECT user_id, event_id,
        |ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |FROM events QUALIFY rn <= 3""".stripMargin))
    val w = Window.partitionBy("user_id").orderBy(col("ts").desc, col("event_id").desc)
    val viaDf = e.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("user_id", "event_id", "rn")
    assert(viaSql.exceptAll(viaDf).isEmpty && viaDf.exceptAll(viaSql).isEmpty)
  }

  test("parser path: QUALIFY SQL runs directly on an extensions session") {
    // the injectParser route — no explicit desugar call anywhere: the
    // delegating parser rewrites at parse time, so spark.sql() accepts
    // the Snowflake dialect as-is on a GraftExtensions session
    val shared = graft.SparkSuite.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-qualify-parser")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(shared)
    org.apache.spark.sql.SparkSession.setActiveSession(shared)

    graft.Tables.load(s, sf, "events").createOrReplaceTempView("qp_events")
    val out = s.sql(
      """SELECT user_id, event_id,
        |ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |FROM qp_events QUALIFY rn <= 3""".stripMargin)
    val counts = out.groupBy("user_id").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) <= 3))
    // a QUALIFY inside a string literal survives the parser untouched
    val lit = s.sql("SELECT 'QUALIFY x' AS l").head().getString(0)
    assert(lit == "QUALIFY x")
    // and plain statements (DDL included) pass through the delegate
    assert(s.sql("SELECT 1 + 1").head().getInt(0) == 2)
  }

  test("direct window form: QUALIFY ROW_NUMBER() OVER (...) <= k") {
    val e = graft.Tables.load(spark, sf, "events")
    e.createOrReplaceTempView("events")
    val viaSql = spark.sql(Qualify.desugar(
      """SELECT user_id, event_id FROM events
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) <= 2
        |ORDER BY user_id, event_id""".stripMargin))
    assert(viaSql.columns.toSeq == Seq("user_id", "event_id")) // helper column dropped
    val counts = viaSql.groupBy("user_id").count().collect()
    assert(counts.nonEmpty && counts.forall(_.getLong(1) <= 2))
  }
}
