package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** SQL CALL maintenance procedures: compact (incl. z-order), snapshot
  * expiration, rollback. */
class ProceduresSpec extends SparkFunSuite {

  private lazy val wh: String = {
    val w = scratch("proc-wh")
    spark.conf.set("spark.sql.catalog.prx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.prx.warehouse", w)
    w
  }

  test("CALL system.compact bin-packs and z-orders through SQL") {
    graft.Tables.deleteRecursively(s"$wh/db/c")
    spark.sql("CREATE TABLE prx.db.c (id BIGINT, v DOUBLE)")
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id").as("id"), col("value").as("v"))
      .repartition(24).writeTo("prx.db.c").append()
    val before = spark.table("prx.db.c").count()
    val res = spark.sql(
      "CALL prx.system.compact(table => 'db.c', zorder_by => 'id,v')").head()
    assert(res.getInt(0) == 2) // create(0) + append(1) + compact(2)
    assert(res.getLong(1) < 24)
    assert(spark.table("prx.db.c").count() == before)
  }

  test("CALL system.rollback restores an old version as a new commit") {
    graft.Tables.deleteRecursively(s"$wh/db/r")
    spark.sql("CREATE TABLE prx.db.r (id BIGINT)")
    spark.sql("INSERT INTO prx.db.r VALUES (1), (2)")
    spark.sql("INSERT INTO prx.db.r VALUES (3)")
    assert(spark.table("prx.db.r").count() == 3)
    val res = spark.sql("CALL prx.system.rollback(table => 'db.r', version => 1)").head()
    assert(res.getInt(0) == 1 && res.getInt(1) == 3)
    assert(spark.table("prx.db.r").count() == 2) // back to v1 content
    // the rolled-back-over commit is still travelable
    assert(spark.sql("SELECT count(*) FROM prx.db.r VERSION AS OF 2").head().getLong(0) == 3)
  }

  test("CALL system.remove_orphans deletes unreferenced data files only") {
    graft.Tables.deleteRecursively(s"$wh/db/o")
    spark.sql("CREATE TABLE prx.db.o (id BIGINT)")
    spark.sql("INSERT INTO prx.db.o VALUES (1), (2)")
    // plant an orphan: a parquet file in data/ no snapshot references
    val orphanDir = java.nio.file.Paths.get(s"$wh/db/o/data/orphaned")
    java.nio.file.Files.createDirectories(orphanDir)
    spark.range(3).write.parquet(s"$orphanDir/junk")
    val res = spark.sql(
      "CALL prx.system.remove_orphans(table => 'db.o', grace_ms => 0)").head()
    assert(res.getLong(0) >= 1)
    // live data untouched, orphan parquet gone
    assert(spark.table("prx.db.o").count() == 2)
    val remaining = java.nio.file.Files.walk(orphanDir).iterator()
    import scala.jdk.CollectionConverters._
    assert(!remaining.asScala.exists(_.toString.endsWith(".parquet")))
  }

  test("CALL system.expire_snapshots trims history and deletes dead files") {
    graft.Tables.deleteRecursively(s"$wh/db/e")
    spark.sql("CREATE TABLE prx.db.e (id BIGINT)")
    spark.sql("INSERT INTO prx.db.e VALUES (1)")
    spark.sql("INSERT OVERWRITE prx.db.e VALUES (2)")
    val t = SnapshotTable.load(spark, s"$wh/db/e")
    assert(t.versions.size == 3)
    val res = spark.sql(
      "CALL prx.system.expire_snapshots(table => 'db.e', keep_last => 1)").head()
    assert(res.getInt(0) == 1)
    assert(t.versions.size == 1)
    assert(spark.table("prx.db.e").count() == 1)
  }
}
