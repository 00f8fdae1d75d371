package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming read FROM a graft table: snapshot versions as offsets, each
  * micro-batch exactly the appended files — the source-side complement of
  * the exactly-once streaming sink. */
class StreamingSourceSpec extends SparkFunSuite {

  private def mkCatalog(cat: String): String = {
    val wh = scratch(s"$cat-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    wh
  }

  test("streaming read drains the table, then consumes only later appends") {
    val wh = mkCatalog("srcx")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srcx.db.src
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 600).writeTo("srcx.db.src").append()
    events.filter(col("event_id") >= 600 && col("event_id") < 900)
      .writeTo("srcx.db.src").append()

    val ckpt = scratch("srcx-ckpt")
    val batches = scala.collection.mutable.ListBuffer[Long]()
    def drain(): Unit =
      spark.readStream.table("srcx.db.src")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = b.count()
          if (n > 0) batches.synchronized { batches += n }
          ()
        }
        .start()
        .awaitTermination()

    drain()
    assert(batches.sum == 900, s"first drain read ${batches.sum} rows")

    // same checkpoint, no new commits: nothing re-read
    drain()
    assert(batches.sum == 900, s"restart re-read rows: $batches")

    // a later append is consumed as exactly its delta
    events.filter(col("event_id") >= 900).writeTo("srcx.db.src").append()
    drain()
    val total = events.count()
    assert(batches.sum == total, s"delta drain read ${batches.sum} of $total")
  }

  test("pushed filters prune and apply on the stream") {
    val wh = mkCatalog("srcf")
    spark.sql(
      """CREATE TABLE srcf.db.f
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .writeTo("srcf.db.f").append()

    val ckpt = scratch("srcf-ckpt")
    var seen = 0L
    spark.readStream.table("srcf.db.f")
      .filter(col("event_type") === "purchase")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen += b.count(); ()
      }
      .start()
      .awaitTermination()
    val expected = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(seen == expected)
  }

  test("maxFilesPerTrigger bounds every micro-batch, splitting mid-version") {
    val wh = mkCatalog("srcm")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srcm.db.rl
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    // one append committing SEVERAL files: admission control must split
    // inside the version, not just between versions
    events.filter(col("event_id") < 600).repartition(4)
      .writeTo("srcm.db.rl").append()
    events.filter(col("event_id") >= 600).repartition(3)
      .writeTo("srcm.db.rl").append()
    val nFiles = {
      val t = SnapshotTable.load(spark, s"$wh/db/rl")
      t.snapshot(t.latestVersion).files.size
    }
    assert(nFiles == 7, s"expected 7 files, got $nFiles")

    var total = 0L
    var batches = 0
    spark.readStream
      .option("maxFilesPerTrigger", "2")
      .table("srcm.db.rl")
      .writeStream
      .option("checkpointLocation", scratch("srcm-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = b.count()
        if (n > 0) { total += n; batches += 1 }
        ()
      }
      .start()
      .awaitTermination()
    assert(total == events.count(), s"rate-limited drain read $total rows")
    // 7 files at <=2 per batch -> at least 4 non-empty batches
    assert(batches >= 4, s"backlog not split into bounded batches: $batches")
  }

  test("a non-append commit in the offset range fails the stream clearly") {
    val wh = mkCatalog("srcr")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srcr.db.rw
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 500).writeTo("srcr.db.rw").append()

    val ckpt = scratch("srcr-ckpt")
    def drain(): Unit =
      spark.readStream.table("srcr.db.rw")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
        .start()
        .awaitTermination()
    drain()

    // compact rewrites the file set: replaying (v1, v2] would double-read
    SnapshotTable.load(spark, s"$wh/db/rw").compact()
    events.filter(col("event_id") >= 500).writeTo("srcr.db.rw").append()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { drain() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-append")),
      s"expected the appends-only guard, got: ${messages(e).mkString(" | ")}")
  }

  test("a rewrite commit BEFORE the stream start does not fail the stream") {
    val wh = mkCatalog("srch")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srch.db.hist
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 500).writeTo("srch.db.hist").append()
    // historical rewrite: versions before the tail point contain a
    // compact — the documented pattern is to restart the stream from the
    // current snapshot, which must WORK, not crash at drain start
    SnapshotTable.load(spark, s"$wh/db/hist").compact()
    val atSetup = SnapshotTable.load(spark, s"$wh/db/hist").latestVersion
    events.filter(col("event_id") >= 500).writeTo("srch.db.hist").append()

    var seen = 0L
    spark.readStream
      .option("stream_from_version", atSetup.toString)
      .option("maxFilesPerTrigger", "1")
      .table("srch.db.hist")
      .writeStream
      .option("checkpointLocation", scratch("srch-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen += b.count(); ()
      }
      .start()
      .awaitTermination()
    assert(seen == events.filter(col("event_id") >= 500).count(),
      s"tail past a compacted history read $seen rows")
  }

  test("stream_from_version tails only future appends") {
    val wh = mkCatalog("srct")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srct.db.tail
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 800).writeTo("srct.db.tail").append()
    val atSetup = SnapshotTable.load(spark, s"$wh/db/tail").latestVersion

    events.filter(col("event_id") >= 800).writeTo("srct.db.tail").append()
    var seen = 0L
    spark.readStream
      .option("stream_from_version", atSetup.toString)
      .table("srct.db.tail")
      .writeStream
      .option("checkpointLocation", scratch("srct-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        seen += b.count(); ()
      }
      .start()
      .awaitTermination()
    assert(seen == events.filter(col("event_id") >= 800).count(),
      s"tail stream read $seen rows")
  }
}
