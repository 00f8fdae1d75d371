package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The DSv2 streaming sink: `writeStream.toTable` into a graft catalog
  * table, epoch-committed snapshots, exactly-once across restarts. */
class StreamingSinkSpec extends SparkFunSuite {

  test("writeStream.toTable appends epoch snapshots and replays exactly once") {
    val wh = scratch("streamsink-wh")
    spark.conf.set("spark.sql.catalog.ssx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ssx.warehouse", wh)
    val src = scratch("streamsink-src")
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      .repartition(6).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    spark.sql(
      """CREATE TABLE ssx.db.sink
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)

    val ckpt = scratch("streamsink-ckpt")
    def runOnce(): Unit =
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "2").parquet(src)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .toTable("ssx.db.sink")
        .awaitTermination()

    runOnce()
    val expected = spark.read.parquet(src).count()
    assert(spark.table("ssx.db.sink").count() == expected)

    // several micro-batches → several epoch-tagged snapshots
    val t = SnapshotTable.load(spark, s"$wh/db/sink")
    val epochTags = t.versions.map(v => t.snapshot(v).operation)
      .filter(_.startsWith("stream-"))
    assert(epochTags.size >= 2, s"expected multiple epochs, got $epochTags")
    assert(epochTags.distinct.size == epochTags.size)

    // restart on the same checkpoint with no new input: no duplicates
    runOnce()
    assert(spark.table("ssx.db.sink").count() == expected)

    // pruning and aggregates still work through the manifest
    val direct = spark.read.parquet(src)
      .filter(col("event_type") === "purchase").count()
    assert(spark.sql(
      "SELECT count(*) FROM ssx.db.sink WHERE event_type = 'purchase'")
      .head().getLong(0) == direct)
  }

  test("streaming sink into a PARTITIONED table keeps partition columns queryable") {
    val wh = scratch("streamsink-part-wh")
    spark.conf.set("spark.sql.catalog.spx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spx.warehouse", wh)
    val src = scratch("streamsink-part-src")
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"), col("value"))
      .repartition(4).write.parquet(src)
    val schema = spark.read.parquet(src).schema
    spark.sql(
      """CREATE TABLE spx.db.psink
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, day DATE, value DOUBLE)
        |PARTITIONED BY (day)""".stripMargin)
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "2").parquet(src)
      .writeStream
      .option("checkpointLocation", scratch("streamsink-part-ckpt"))
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable("spx.db.psink")
      .awaitTermination()
    val expected = spark.read.parquet(src)
    assert(spark.table("spx.db.psink").count() == expected.count())
    // the partition column is in the streamed (flat) files, so day
    // predicates answer correctly
    val d = expected.select(max("day")).head().getDate(0).toString
    assert(spark.sql(s"SELECT count(*) FROM spx.db.psink WHERE day = DATE '$d'")
      .head().getLong(0) == expected.filter(col("day") === d).count())
  }
}
