package graft.table

import graft.SparkFunSuite

/** SQL UPDATE / MERGE INTO through the DSv2 row-level operation protocol
  * (group-based copy-on-write). Every mutation must be a new snapshot —
  * old versions stay readable — and concurrent-commit conflicts abort. */
class RowLevelSpec extends SparkFunSuite {

  // one warehouse for the suite: catalog instances are cached per name,
  // so re-pointing spark.sql.catalog.rlx.warehouse after first use is a
  // silent no-op
  private lazy val wh: String = {
    val w = scratch("rowlevel-wh")
    spark.conf.set("spark.sql.catalog.rlx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.rlx.warehouse", w)
    w
  }

  private def freshTable(name: String): String = {
    val fq = s"rlx.db.$name"
    graft.Tables.deleteRecursively(s"$wh/db/$name")
    spark.sql(s"CREATE TABLE $fq (id BIGINT, v DOUBLE, tag STRING)")
    spark.sql(
      s"""INSERT INTO $fq VALUES
         |  (1, 10.0, 'a'), (2, 20.0, 'a'), (3, 30.0, 'b'),
         |  (4, 40.0, 'b'), (5, CAST(NULL AS DOUBLE), 'c')""".stripMargin)
    fq
  }

  test("SQL UPDATE rewrites matching rows and keeps history") {
    val t = freshTable("upd")
    spark.sql(s"UPDATE $t SET v = v * 2, tag = 'hot' WHERE id >= 3")
    val rows = spark.sql(s"SELECT id, v, tag FROM $t ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    assert(rows(2).getDouble(1) == 60.0 && rows(2).getString(2) == "hot")
    assert(rows(3).getDouble(1) == 80.0)
    // id=5 matched (5 >= 3) but v was NULL: NULL * 2 = NULL, tag updated
    assert(rows(4).isNullAt(1) && rows(4).getString(2) == "hot")
    assert(rows(0).getDouble(1) == 10.0 && rows(0).getString(2) == "a")
    // the update is a snapshot on top of the insert — time travel sees both
    val v1 = spark.sql(s"SELECT v FROM $t VERSION AS OF 1 WHERE id = 3").head().getDouble(0)
    assert(v1 == 30.0)
  }

  test("UPDATE with a predicate over a NULL column leaves NULL-predicate rows untouched") {
    val t = freshTable("updnull")
    // v = NULL on id=5: `v < 25` is NULL there, so the row must NOT update
    spark.sql(s"UPDATE $t SET tag = 'cheap' WHERE v < 25.0")
    val tags = spark.sql(s"SELECT id, tag FROM $t ORDER BY id").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(tags(1L) == "cheap" && tags(2L) == "cheap")
    assert(tags(3L) == "b" && tags(5L) == "c")
  }

  test("UPDATE rewrites only files whose stats can match the predicate") {
    val fq = "rlx.db.grouped"
    graft.Tables.deleteRecursively(s"$wh/db/grouped")
    spark.sql(s"CREATE TABLE $fq (event_id BIGINT, value DOUBLE)")
    // range-partitioned insert → files with disjoint event_id ranges
    graft.Tables.load(spark, sf, "events")
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value"))
      .repartitionByRange(8, org.apache.spark.sql.functions.col("event_id"))
      .sortWithinPartitions("event_id")
      .writeTo(fq).append()
    val t = SnapshotTable.load(spark, s"$wh/db/grouped")
    val before = t.snapshot(t.latestVersion).files.map(_.path).toSet
    assert(before.size >= 8)
    val expected = spark.table(fq).count()

    spark.sql(s"UPDATE $fq SET value = 0.0 WHERE event_id < 100")
    val after = t.snapshot(t.latestVersion).files.map(_.path).toSet
    // most range-files can't contain event_id < 100 → they must survive
    val surviving = before.intersect(after)
    assert(surviving.size >= before.size - 2,
      s"expected file-confined rewrite: kept ${surviving.size} of ${before.size}")
    assert(after != before, "at least one file must be rewritten")
    // content still exact
    assert(spark.table(fq).count() == expected)
    assert(spark.sql(s"SELECT count(*) FROM $fq WHERE event_id < 100 AND value <> 0.0")
      .head().getLong(0) == 0)
    assert(spark.sql(s"SELECT count(*) FROM $fq WHERE event_id >= 100 AND value = 0.0")
      .head().getLong(0) ==
      graft.Tables.load(spark, sf, "events")
        .filter("event_id >= 100 AND value = 0.0").count())
  }

  test("UPDATE and DELETE work on partitioned tables (in-file partition columns)") {
    val fq = "rlx.db.parted"
    graft.Tables.deleteRecursively(s"$wh/db/parted")
    spark.sql(s"CREATE TABLE $fq (id BIGINT, day DATE, v DOUBLE) PARTITIONED BY (day)")
    spark.sql(
      s"""INSERT INTO $fq VALUES
         |  (1, DATE '2024-01-01', 1.0), (2, DATE '2024-01-02', 2.0),
         |  (3, DATE '2024-01-02', 3.0), (4, DATE '2024-01-03', 4.0)""".stripMargin)
    spark.sql(s"UPDATE $fq SET v = v + 10 WHERE day = DATE '2024-01-02'")
    spark.sql(s"DELETE FROM $fq WHERE v >= 13.0")
    val rows = spark.sql(s"SELECT id, day, v FROM $fq ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    assert(rows(1).getDouble(2) == 12.0) // updated in place
    assert(rows(0).getDouble(2) == 1.0 && rows(2).getDouble(2) == 4.0)
    // the day column survives the rewrite (it lives in the data files)
    assert(spark.sql(s"SELECT count(*) FROM $fq WHERE day = DATE '2024-01-02'")
      .head().getLong(0) == 1)
  }

  test("INSERT OVERWRITE PARTITION replaces only the targeted partition") {
    val fq = "rlx.db.partow"
    graft.Tables.deleteRecursively(s"$wh/db/partow")
    spark.sql(s"CREATE TABLE $fq (id BIGINT, day DATE, v DOUBLE) PARTITIONED BY (day)")
    spark.sql(
      s"""INSERT INTO $fq VALUES
         |  (1, DATE '2024-01-01', 1.0), (2, DATE '2024-01-02', 2.0),
         |  (3, DATE '2024-01-02', 3.0)""".stripMargin)
    spark.sql(
      s"INSERT OVERWRITE $fq PARTITION (day = DATE '2024-01-02') (id, v) VALUES (9, 99.0)")
    val rows = spark.sql(s"SELECT id, day, v FROM $fq ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 9L))
    assert(rows(0).getDouble(2) == 1.0) // untouched partition carried over
    assert(rows(1).getDate(1).toString == "2024-01-02" && rows(1).getDouble(2) == 99.0)
    // full overwrite still truncates
    spark.sql(s"INSERT OVERWRITE $fq VALUES (7, DATE '2024-02-01', 7.0)")
    assert(spark.table(fq).count() == 1)
  }

  test("SQL MERGE INTO updates matches, inserts the rest, deletes on demand") {
    val t = freshTable("merge")
    import spark.implicits._
    Seq((2L, 200.0), (5L, 500.0), (6L, 600.0), (7L, 700.0))
      .toDF("id", "v").createOrReplaceTempView("rl_src")
    spark.sql(
      s"""MERGE INTO $t g USING rl_src s ON g.id = s.id
         |WHEN MATCHED AND g.id = 5 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v
         |WHEN NOT MATCHED THEN INSERT (id, v, tag) VALUES (s.id, s.v, 'new')""".stripMargin)
    val rows = spark.sql(s"SELECT id, v, tag FROM $t ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L, 6L, 7L))
    assert(rows(1).getDouble(1) == 200.0 && rows(1).getString(2) == "a") // updated
    assert(rows(4).getDouble(1) == 600.0 && rows(4).getString(2) == "new") // inserted
    // three snapshots: create(0), insert(1), merge(2)
    val hist = SnapshotTable.load(spark, s"$wh/db/merge")
    assert(hist.latestVersion == 2)
  }

  test("DELETE with a subquery condition routes through the row-level rewrite") {
    val t = freshTable("delsubq")
    import spark.implicits._
    // canDeleteWhere refuses non-static filters, so Spark falls back to
    // the group-based row-level DELETE (ReplaceData) instead of the
    // metadata-only path
    Seq(2L, 4L).toDF("del_id").createOrReplaceTempView("rl_del_src")
    spark.sql(s"DELETE FROM $t WHERE id IN (SELECT del_id FROM rl_del_src)")
    val rows = spark.sql(s"SELECT id, v FROM $t ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 3L, 5L))
    assert(rows(1).getDouble(1) == 30.0)
    // the delete is one new snapshot; the pre-delete version still reads
    val hist = SnapshotTable.load(spark, s"$wh/db/delsubq")
    assert(spark.sql(s"SELECT count(*) FROM $t VERSION AS OF ${hist.latestVersion - 1}")
      .head().getLong(0) == 5)
  }

  test("MERGE on a partitioned table rewrites only the partitions the source touches") {
    import org.apache.spark.sql.functions._
    val fq = "rlx.db.merge_dpp"
    graft.Tables.deleteRecursively(s"$wh/db/merge_dpp")
    spark.sql(
      s"""CREATE TABLE $fq (event_id BIGINT, day DATE, value DOUBLE)
         |PARTITIONED BY (day)""".stripMargin)
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), to_date(col("ts")).as("day"), col("value"))
      .writeTo(fq).append()
    val t = SnapshotTable.load(spark, s"$wh/db/merge_dpp")
    val before = t.snapshot(t.latestVersion).files.map(_.path).toSet
    val nDays = t.snapshot(t.latestVersion).files
      .flatMap(_.stats.get("day").map(_.min)).distinct.size
    assert(nDays >= 25, s"expected ~30 day partitions, got $nDays")

    // source keys live in exactly two days; the ON condition references
    // the source, so STATIC pruning sees nothing — only the runtime
    // group filter can confine the rewrite. The source is materialized as
    // a standalone LocalRelation: a temp view derived from the target
    // table would carry a lazy table reference that DPP subquery
    // planning cannot resolve.
    import graft.SparkSuite.spark.implicits._
    val ids = spark.table(fq)
      .filter(col("day").isin("2024-01-03", "2024-01-04"))
      .select("event_id").limit(20)
      .as[Long].collect().toSeq
    ids.map(id => (id, -1.0)).toDF("event_id", "nv")
      .createOrReplaceTempView("rl_dpp_src")
    val expectedUpdated = ids.size.toLong
    spark.sql(
      s"""MERGE INTO $fq g USING rl_dpp_src s ON g.event_id = s.event_id
         |WHEN MATCHED THEN UPDATE SET value = s.nv""".stripMargin)

    assert(spark.table(fq).filter(col("value") === -1.0).count() == expectedUpdated)
    assert(spark.table(fq).count() == graft.Tables.load(spark, sf, "events").count())
    val after = SnapshotTable.load(spark, s"$wh/db/merge_dpp")
    val survivors = after.snapshot(after.latestVersion).files.map(_.path).toSet
    val untouched = (before intersect survivors).size
    // without runtime group filtering every file is rewritten (untouched
    // = 0); with it the ~28 non-matching days' files keep their paths
    assert(untouched > before.size / 2,
      s"runtime group filter did not confine the MERGE: $untouched of ${before.size} files survived")
  }
}
