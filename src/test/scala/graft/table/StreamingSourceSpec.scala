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

  test("skip_rewrites=compact rides over routine compaction, nothing lost or doubled") {
    val wh = mkCatalog("srcc")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srcc.db.cmp
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 500).writeTo("srcc.db.cmp").append()

    val ckpt = scratch("srcc-ckpt")
    val ids = scala.collection.mutable.ListBuffer[Long]()
    def drain(): Unit =
      spark.readStream
        .option("skip_rewrites", "compact")
        .table("srcc.db.cmp")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          val got = b.select("event_id").collect().map(_.getLong(0))
          ids.synchronized { ids ++= got }
          ()
        }
        .start()
        .awaitTermination()

    drain()
    assert(ids.size == 500, s"first drain read ${ids.size} rows")

    // routine maintenance between drains: a pure compact rewrites the
    // whole file set but preserves the row multiset — the stream must
    // skip it and keep consuming appends on either side of it
    SnapshotTable.load(spark, s"$wh/db/cmp").compact()
    events.filter(col("event_id") >= 500).writeTo("srcc.db.cmp").append()
    drain()

    val expected = events.select("event_id").collect().map(_.getLong(0)).sorted
    assert(ids.sorted.toSeq == expected.toSeq,
      s"compaction-skipping drain lost or doubled rows: got ${ids.size}, want ${expected.length}")

    // and an overwrite must STILL fail — skip_rewrites only covers compact
    SnapshotTable.load(spark, s"$wh/db/cmp")
      .overwrite(events.filter(col("event_id") < 10))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { drain() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("non-append")),
      s"overwrite must keep failing under skip_rewrites=compact: ${messages(e).mkString(" | ")}")
  }

  test("skip_rewrites=compact under a file budget: compact mid-drain versions stay bounded") {
    val wh = mkCatalog("srck")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srck.db.b
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 300).repartition(3).writeTo("srck.db.b").append()
    SnapshotTable.load(spark, s"$wh/db/b").compact()
    events.filter(col("event_id") >= 300).repartition(3).writeTo("srck.db.b").append()

    var total = 0L
    var batches = 0
    spark.readStream
      .option("skip_rewrites", "compact")
      .option("maxFilesPerTrigger", "2")
      .table("srck.db.b")
      .writeStream
      .option("checkpointLocation", scratch("srck-ckpt"))
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val n = b.count()
        if (n > 0) { total += n; batches += 1 }
        ()
      }
      .start()
      .awaitTermination()
    assert(total == events.count(),
      s"rate-limited drain over a compacted log read $total rows")
    assert(batches >= 3, s"expected bounded batches around the skipped compact: $batches")
  }

  test("bad streaming options are named: skip_rewrites values and non-integer limits") {
    mkCatalog("srcb")
    spark.sql("CREATE TABLE srcb.db.o (event_id BIGINT)")

    def startFails(opt: (String, String)): Throwable = intercept[Exception] {
      spark.readStream.option(opt._1, opt._2).table("srcb.db.o")
        .writeStream
        .option("checkpointLocation", scratch(s"srcb-${opt._1}-${opt._2.filter(_.isLetterOrDigit)}"))
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
        .start()
        .awaitTermination()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)

    val badLimit = startFails("maxFilesPerTrigger" -> "2k")
    assert(messages(badLimit).exists(m =>
      m.contains("maxFilesPerTrigger") && m.contains("2k")), messages(badLimit).mkString(" | "))

    val badSkip = startFails("skip_rewrites" -> "overwrite")
    assert(messages(badSkip).exists(m =>
      m.contains("skip_rewrites") && m.contains("overwrite")), messages(badSkip).mkString(" | "))
  }

  test("expire_snapshots past the checkpoint fails restart with the recovery path") {
    val wh = mkCatalog("srce")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srce.db.ex
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 200).writeTo("srce.db.ex").append()

    val ckpt = scratch("srce-ckpt")
    def drain(): Unit =
      spark.readStream.table("srce.db.ex")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
        .start()
        .awaitTermination()
    drain()

    // several appends, then expire history INCLUDING the checkpointed
    // version: the restart must say what happened and how to recover,
    // not throw a raw NoSuchFileException
    events.filter(col("event_id") >= 200 && col("event_id") < 400)
      .writeTo("srce.db.ex").append()
    events.filter(col("event_id") >= 400).writeTo("srce.db.ex").append()
    SnapshotTable.load(spark, s"$wh/db/ex").expireSnapshots(keepLast = 1)

    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { drain() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("expire_snapshots") && m.contains("stream_from_version")),
      s"expected the recovery hint, got: ${messages(e).mkString(" | ")}")
  }

  test("mid-stream RENAME fails the running stream; ADD COLUMN rides through") {
    val wh = mkCatalog("srcg")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srcg.db.ex
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 200).writeTo("srcg.db.ex").append()

    // CONTINUOUS stream (default trigger): an AvailableNow drain caps its
    // version range at start and never sees a late ALTER — the hazard is
    // a 24/7 stream whose captured scan outlives the schema
    var total = 0L
    val ckpt = scratch("srcg-ckpt")
    val q = spark.readStream.table("srcg.db.ex")
      .writeStream
      .option("checkpointLocation", ckpt)
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        total += b.count(); ()
      }
      .start()
    q.processAllAvailable()
    assert(total == 200)

    // column-adding ALTER mid-stream: benign, the stream keeps reading
    // (new column invisible to the captured scan, old columns unchanged)
    spark.sql("ALTER TABLE srcg.db.ex ADD COLUMN note STRING")
    events.filter(col("event_id") >= 200 && col("event_id") < 400)
      .writeTo("srcg.db.ex").append()
    q.processAllAvailable()
    assert(q.exception.isEmpty, s"ADD COLUMN killed the stream: ${q.exception}")
    assert(total == 400, s"rows lost across mid-stream ADD COLUMN: $total")

    // RENAME mid-stream: files appended after it store the NEW physical
    // name while the captured scan requests the old one — the stream
    // must fail loudly, never silently null the column
    spark.sql("ALTER TABLE srcg.db.ex RENAME COLUMN value TO amount")
    events.filter(col("event_id") >= 400)
      .withColumnRenamed("value", "amount").writeTo("srcg.db.ex").append()
    val e = intercept[Exception] { q.processAllAvailable() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("ALTER") && m.contains("compact")),
      s"expected the mid-stream ALTER guard, got: ${messages(e).mkString(" | ")}")

    // the recovery path the error message promises: compact normalizes
    // live files to the renamed schema, then a restart (riding over the
    // compaction) replans and reads everything
    SnapshotTable.load(spark, s"$wh/db/ex").compact(targetBytes = 64L * 1024 * 1024)
    var total2 = 0L
    spark.readStream.option("skip_rewrites", "compact").table("srcg.db.ex")
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        total2 += b.count(); ()
      }
      .start()
      .awaitTermination()
    assert(total + total2 == events.count(),
      s"restart lost rows: $total + $total2 != ${events.count()}")
  }

  test("retention floor: a stream checkpointed within the policy survives expire") {
    val wh = mkCatalog("srcf")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srcf.db.ex
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 200).writeTo("srcf.db.ex").append()

    val ckpt = scratch("srcf-ckpt")
    var total = 0L
    def drain(): Unit =
      spark.readStream.table("srcf.db.ex")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          total += b.count(); ()
        }
        .start()
        .awaitTermination()
    drain()

    // policy floor via SQL TBLPROPERTIES: the same maintenance call that
    // orphaned the checkpoint in the guard-less spec above now CANNOT
    // collect the versions the checkpoint still needs
    spark.sql(
      """ALTER TABLE srcf.db.ex SET TBLPROPERTIES
        |  ('history.expire.min-snapshots-to-keep' = '10')""".stripMargin)
    events.filter(col("event_id") >= 200 && col("event_id") < 400)
      .writeTo("srcf.db.ex").append()
    events.filter(col("event_id") >= 400).writeTo("srcf.db.ex").append()
    val t = SnapshotTable.load(spark, s"$wh/db/ex")
    val before = t.versions.size
    t.expireSnapshots(keepLast = 1)
    assert(t.versions.size == before,
      s"expire collected below the 10-snapshot floor: ${t.versions.size} of $before")

    drain() // restart rides the retained history and reads the new appends
    assert(total == events.count(),
      s"stream lost rows across the guarded expire: $total of ${events.count()}")
  }

  test("q63 (registry pipeline) matches the batch aggregate with a compaction interleaved") {
    val df = graft.queries.Ops.q63(spark, sf)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val want = graft.Tables.load(spark, sf, "events")
      .groupBy(col("event_type")).count()
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got == want, s"q63 rows diverged from batch: got $got want $want")
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

  test("a merge-on-read DELETE in the unconsumed range fails the stream, pointing at changes()") {
    val wh = mkCatalog("srcm")
    val events = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
    spark.sql(
      """CREATE TABLE srcm.db.mor
        |  (event_id BIGINT, event_type STRING, value DOUBLE)""".stripMargin)
    events.filter(col("event_id") < 500).writeTo("srcm.db.mor").append()

    val ckpt = scratch("srcm-ckpt")
    def drain(): Unit =
      spark.readStream.table("srcm.db.mor")
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) => b.count(); () }
        .start()
        .awaitTermination()
    drain()

    // a position delete changes the row multiset without touching the
    // file list — the appends-only stream must still refuse (its deltas
    // cannot express -rows), and the error must hand the consumer the
    // CDC remedy
    SnapshotTable.load(spark, s"$wh/db/mor")
      .positionDelete(col("event_id") < 50)
    events.filter(col("event_id") >= 500).writeTo("srcm.db.mor").append()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] { drain() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m => m.contains("delete") && m.contains("changes(")),
      s"expected the appends-only guard with the CDC pointer, got: ${messages(e).mkString(" | ")}")
  }

  test("CdcDynamicTable refreshes across MOR delete and merge commits, matching full recompute") {
    val srcLoc = scratch("cdc-dyn-src")
    val mvLoc = scratch("cdc-dyn-mv")
    val events = graft.Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value", "ts")

    val src = SnapshotTable.create(spark, srcLoc,
      events.filter(col("event_id") < 700))
    val dyn = new graft.streaming.Streams.CdcDynamicTable(spark, mvLoc)
    def recompute() = src.read().groupBy("user_id").agg(
      count(lit(1)).as("event_count"),
      sum(col("value").cast("decimal(18,2)")).cast("decimal(28,2)")
        .as("total_value"),
      max(col("ts")).as("last_seen"),
      sort_array(collect_set(col("event_type"))).as("event_types"))
    def assertMatches(): Unit = {
      val got = dyn.refresh(srcLoc)
      val want = recompute()
      assert(got.count() == want.count())
      assert(got.unionAll(want).distinct().count() == want.count(),
        "incremental MV state diverged from the full recompute")
    }
    assertMatches() // initial build

    // appends refresh incrementally
    src.append(events.filter(col("event_id") >= 700 && col("event_id") < 850))
    assertMatches()

    // a MOR DELETE — the commit the appends-only dynamic table cannot
    // cross — refreshes exactly (deleted users' groups recomputed; groups
    // losing every row vanish)
    src.positionDelete(col("user_id") % 3 === 1)
    assertMatches()

    // a MOR MERGE (update + insert rows) refreshes exactly too
    src.mergeMor(events.filter(col("event_id") >= 800)
      .withColumn("value", col("value") * 2), Seq("event_id"))
    assertMatches()

    // no new commits → refresh is a watermark no-op
    val before = SnapshotTable.load(spark, mvLoc).latestVersion
    dyn.refresh(srcLoc)
    assert(SnapshotTable.load(spark, mvLoc).latestVersion == before)
  }
}
