package graft.table

import graft.SparkFunSuite

/** SQL metadata tables over the snapshot log: history / snapshots / files. */
class MetadataTablesSpec extends SparkFunSuite {

  test("history and files metadata tables are SQL-queryable") {
    val wh = scratch("meta-wh")
    spark.conf.set("spark.sql.catalog.mtx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mtx.warehouse", wh)
    spark.sql("CREATE TABLE mtx.db.t (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO mtx.db.t VALUES (1, 1.5), (2, 2.5)")
    spark.sql("INSERT INTO mtx.db.t VALUES (3, 3.5)")

    val hist = spark.sql(
      "SELECT version, operation, n_rows FROM mtx.db.t.history ORDER BY version")
      .collect()
    assert(hist.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    assert(hist(0).getString(1) == "create" && hist(0).getLong(2) == 0)
    assert(hist(1).getString(1) == "append" && hist(1).getLong(2) == 2)
    assert(hist(2).getLong(2) == 3)

    // snapshots is an alias of history; predicates work above the LocalScan
    assert(spark.sql(
      "SELECT count(*) FROM mtx.db.t.snapshots WHERE operation = 'append'")
      .head().getLong(0) == 2)

    val files = spark.sql(
      "SELECT count(*) AS nf, sum(row_count) AS rows FROM mtx.db.t.files").head()
    assert(files.getLong(1) == 3)
    assert(spark.sql("SELECT stats_json FROM mtx.db.t.files")
      .collect().forall(_.getString(0).contains("\"id\"")))

    // the base table itself still resolves normally
    assert(spark.sql("SELECT count(*) FROM mtx.db.t").head().getLong(0) == 3)
  }
}
