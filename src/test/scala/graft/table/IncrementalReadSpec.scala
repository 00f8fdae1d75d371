package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Incremental reads: appended rows between versions, metadata-only file
  * selection, refusal across rewrites. */
class IncrementalReadSpec extends SparkFunSuite {

  test("appendsSince reads exactly the newly appended rows, from only the new files") {
    val loc = scratch("incr")
    val e = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val t = SnapshotTable.create(spark, loc, e.filter(col("event_id") < 4000))
    t.append(e.filter(col("event_id") >= 4000 && col("event_id") < 8000))
    t.append(e.filter(col("event_id") >= 8000))

    val a1 = e.filter(col("event_id") >= 4000 && col("event_id") < 8000).count()
    val a2 = e.filter(col("event_id") >= 8000).count()
    assert(t.appendsSince(0).count() == a1 + a2)
    assert(t.appendsSince(1).count() == a2)
    assert(t.appendsSince(0, 1).count() == a1)
    assert(t.appendsSince(2).count() == 0)

    // metadata-only: the incremental scan touches none of version 0's files
    val v0Files = t.snapshot(0).files.map(_.path).toSet
    val scanned = t.appendsSince(0).inputFiles.toSet
    assert(scanned.nonEmpty && scanned.intersect(v0Files).isEmpty)

    // a rewrite in the range must refuse rather than resurface old rows
    t.compact(targetBytes = 64L * 1024 * 1024)
    val err = intercept[IllegalArgumentException](t.appendsSince(1))
    assert(err.getMessage.contains("non-append"))
    // ranges before the rewrite still answer
    assert(t.appendsSince(0, 2).count() == a1 + a2)
  }

  test("since_version reader option gives incremental reads through the catalog") {
    val wh = scratch("incr-cat-wh")
    spark.conf.set("spark.sql.catalog.icx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.icx.warehouse", wh)
    spark.sql("CREATE TABLE icx.db.t (id BIGINT)")
    spark.sql("INSERT INTO icx.db.t VALUES (1), (2)")
    spark.sql("INSERT INTO icx.db.t VALUES (3)")
    val incr = spark.read.option("since_version", "1").table("icx.db.t")
    assert(incr.as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect().toSet == Set(3L))
    // nothing new after the latest version
    assert(spark.read.option("since_version", "2").table("icx.db.t").count() == 0)
    // predicates still prune within the incremental file set
    assert(spark.read.option("since_version", "0").table("icx.db.t")
      .filter("id > 1").count() == 2)

    // skip_rewrites=compact: a routine compaction between the checkpoint
    // and now is an empty delta — same option, same shared algorithm as
    // the streaming source; without it the range refuses
    SnapshotTable.load(spark, s"$wh/db/t").compact()
    spark.sql("INSERT INTO icx.db.t VALUES (4)")
    intercept[Exception] {
      spark.read.option("since_version", "2").table("icx.db.t").count()
    }
    assert(spark.read.option("since_version", "2")
      .option("skip_rewrites", "compact").table("icx.db.t")
      .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet == Set(4L))
  }
}
