package graft.table

import graft.SparkFunSuite

/** SQL DDL surface through the catalog: CTAS, CREATE OR REPLACE,
  * RENAME (metadata-only manifest rewrite), DROP. */
class DdlSpec extends SparkFunSuite {

  test("CTAS, CREATE OR REPLACE, RENAME, DROP round-trip") {
    val wh = scratch("ddl-wh")
    spark.conf.set("spark.sql.catalog.ddx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ddx.warehouse", wh)
    spark.sql("CREATE TABLE ddx.db.src (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO ddx.db.src VALUES (1, 1.5), (2, 2.5)")

    spark.sql("CREATE TABLE ddx.db.dst AS SELECT id, v * 2 AS v2 FROM ddx.db.src")
    assert(spark.table("ddx.db.dst").count() == 2)
    assert(spark.sql("SELECT sum(v2) FROM ddx.db.dst").head().getDouble(0) == 8.0)

    spark.sql("CREATE OR REPLACE TABLE ddx.db.dst AS SELECT 42 AS answer")
    assert(spark.table("ddx.db.dst").count() == 1)

    // rename moves the dir and rewrites manifest paths — data and time
    // travel must survive under the new name
    spark.sql("INSERT INTO ddx.db.dst VALUES (43)")
    spark.sql("ALTER TABLE ddx.db.dst RENAME TO db.renamed")
    assert(spark.table("ddx.db.renamed").count() == 2)
    assert(spark.sql("SELECT count(*) FROM ddx.db.renamed VERSION AS OF 1")
      .head().getLong(0) == 1)
    assert(!spark.catalog.tableExists("ddx.db.dst"))

    spark.sql("DROP TABLE ddx.db.renamed")
    assert(!spark.catalog.tableExists("ddx.db.renamed"))
  }
}
