package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class QueryCompilerSpec extends SparkFunSuite {

  test("AT(TIMESTAMP => x) translates to TIMESTAMP AS OF x") {
    assert(QueryCompiler.compile("SELECT * FROM t AT(TIMESTAMP => '2024-01-30')") ==
      "SELECT * FROM t TIMESTAMP AS OF '2024-01-30'")
    assert(QueryCompiler.compile(
      "SELECT count(*) FROM events AT(TIMESTAMP => CURRENT_TIMESTAMP() - INTERVAL 1 DAY)")
      .contains("TIMESTAMP AS OF CURRENT_TIMESTAMP() - INTERVAL 1 DAY"))
  }

  test("compiled Snowflake time-travel text runs against the graft catalog") {
    val wh = scratch("qc-wh")
    spark.conf.set("spark.sql.catalog.qc", classOf[graft.table.GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.qc.warehouse", wh)
    val e = graft.Tables.load(spark, sf, "events")
    val t = graft.table.SnapshotTable.create(spark, s"$wh/db/ev",
      e.filter(col("event_id") < 500))
    Thread.sleep(20)
    val mid = new java.sql.Timestamp(System.currentTimeMillis())
    Thread.sleep(20)
    t.append(e.filter(col("event_id") >= 500))
    val sql = s"SELECT count(*) AS n FROM qc.db.ev AT(TIMESTAMP => '$mid')"
    assert(spark.sql(QueryCompiler.compile(sql)).head().getLong(0) == 500L)
  }

  test("QUALIFY + AT compose") {
    val out = QueryCompiler.compile(
      "SELECT a, rank() OVER (ORDER BY a) r FROM t AT(TIMESTAMP => '2024-01-01') QUALIFY r <= 2")
    assert(out.contains("TIMESTAMP AS OF '2024-01-01'"))
    assert(out.contains("__qualify WHERE r <= 2"))
  }
}
