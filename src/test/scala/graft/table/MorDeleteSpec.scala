package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Merge-on-read row-level operations (Iceberg v2 position-delete
  * semantics): [[SnapshotTable.positionDelete]] / [[SnapshotTable.mergeMor]]
  * write (file, pos) delete files instead of rewriting data files; every
  * read surface applies the ledger; compaction folds it; the changelog
  * reports the deltas row-exactly; copy-on-write ops on a delete-bearing
  * table never resurrect deleted rows. */
class MorDeleteSpec extends SparkFunSuite {
  import spark.implicits._

  private def events = graft.Tables.load(spark, sf, "events")
    .select("event_id", "user_id", "event_type", "value")

  // ---------------------------------------------------------------- (a)
  test("positionDelete removes rows without rewriting any data file") {
    val loc = scratch("mor-basic")
    val t = SnapshotTable.create(spark, loc, events.filter($"event_id" < 2000))
    val before = t.snapshot(t.latestVersion)
    val total = t.read().count()
    val toDelete = t.read().filter($"event_id" % 7 === 0).count()

    val n = t.positionDelete($"event_id" % 7 === 0)
    assert(n == toDelete)
    val after = t.snapshot(t.latestVersion)
    // the data file list is IDENTICAL — no rewrite happened
    assert(after.files.map(_.path) == before.files.map(_.path))
    assert(after.deleteFiles.nonEmpty)
    assert(after.operation == "delete")
    assert(after.deleteFiles.map(_.rows).sum == toDelete)
    // readers see the post-delete state
    assert(t.read().count() == total - toDelete)
    assert(t.read().filter($"event_id" % 7 === 0).count() == 0)
    // time travel still sees the pre-delete state
    assert(t.readVersion(before.version).count() == total)
  }

  // ---------------------------------------------------------------- (b)
  test("a second overlapping positionDelete never re-records entries") {
    val loc = scratch("mor-dedup-entries")
    val t = SnapshotTable.create(spark, loc, events.filter($"event_id" < 1000))
    t.positionDelete($"event_id" < 100)
    val entriesAfterFirst =
      t.snapshot(t.latestVersion).deleteFiles.map(_.rows).sum
    // overlapping predicate: only the NOT-yet-deleted matches are recorded
    val n = t.positionDelete($"event_id" < 200)
    assert(n == t.readVersion(0).filter($"event_id" >= 100 && $"event_id" < 200).count())
    val total = t.snapshot(t.latestVersion).deleteFiles.map(_.rows).sum
    assert(total == entriesAfterFirst + n)
    assert(t.read().count() == t.readVersion(0).filter($"event_id" >= 200).count())
  }

  // ---------------------------------------------------------------- (c)
  test("SQL reads (catalog scan) and pushed filters apply the ledger") {
    val wh = scratch("mor-sql-wh")
    spark.conf.set("spark.sql.catalog.morsql", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.morsql.warehouse", wh)
    spark.sql("CREATE TABLE morsql.db.t (id BIGINT, v DOUBLE)")
    spark.range(1000).selectExpr("id", "CAST(id AS DOUBLE)/10 AS v")
      .writeTo("morsql.db.t").append()
    val t = SnapshotTable.load(spark, s"$wh/db/t")
    t.positionDelete(col("id") % 10 === 3)
    assert(spark.sql("SELECT count(*) c FROM morsql.db.t").head().getLong(0) == 900)
    // a pushed predicate over the MOR scan stays exact
    assert(spark.sql("SELECT count(*) c FROM morsql.db.t WHERE id < 100")
      .head().getLong(0) == 90)
    assert(spark.sql("SELECT sum(id) s FROM morsql.db.t WHERE id IN (3, 4, 13)")
      .head().getLong(0) == 4) // 3 and 13 deleted
  }

  // ---------------------------------------------------------------- (d)
  test("SQL DELETE routes merge-on-read under write.delete.mode") {
    val wh = scratch("mor-sqldelete-wh")
    spark.conf.set("spark.sql.catalog.mordel", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mordel.warehouse", wh)
    spark.sql("CREATE TABLE mordel.db.t (id BIGINT, v DOUBLE)")
    spark.range(500).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .writeTo("mordel.db.t").append()
    val t = SnapshotTable.load(spark, s"$wh/db/t")
    t.setProperties(Map(SnapshotTable.DeleteMode -> "merge-on-read"))
    val filesBefore = t.snapshot(t.latestVersion).files.map(_.path)
    spark.sql("DELETE FROM mordel.db.t WHERE id >= 400")
    val s = t.snapshot(t.latestVersion)
    assert(s.operation == "delete")
    assert(s.files.map(_.path) == filesBefore) // no rewrite
    assert(s.deleteFiles.nonEmpty)
    assert(spark.sql("SELECT count(*) c FROM mordel.db.t").head().getLong(0) == 400)
    // without the property the same DELETE shape is copy-on-write
    t.setProperties(Map.empty, unset = Set(SnapshotTable.DeleteMode))
    spark.sql("DELETE FROM mordel.db.t WHERE id >= 300")
    val s2 = t.snapshot(t.latestVersion)
    assert(s2.deleteFiles.isEmpty) // replace() starts a clean ledger
    assert(spark.sql("SELECT count(*) c FROM mordel.db.t").head().getLong(0) == 300)
  }

  // ---------------------------------------------------------------- (e)
  test("compact folds the ledger: same content, clean ledger, plain scan back") {
    val loc = scratch("mor-compact")
    val t = SnapshotTable.create(spark, loc, events.filter($"event_id" < 3000))
    t.positionDelete($"user_id" % 5 === 1)
    val expect = t.read().orderBy("event_id").collect()
    t.compact(targetBytes = 1L << 20)
    val s = t.snapshot(t.latestVersion)
    assert(s.deleteFiles.isEmpty)
    assert(!t.hasDeletes)
    assert(t.read().orderBy("event_id").collect().toSeq == expect.toSeq)
  }

  // ---------------------------------------------------------------- (f)
  test("mergeMor upserts with upsert()-identical semantics, no data rewrite") {
    val loc = scratch("mor-merge")
    val base = events.filter($"event_id" < 800)
    val t = SnapshotTable.create(spark, loc, base)
    val filesBefore = t.snapshot(t.latestVersion).files.map(_.path).toSet
    val updates = events.filter($"event_id" >= 600)
      .withColumn("value", $"value" * 2)
    t.mergeMor(updates, Seq("event_id"))
    val s = t.snapshot(t.latestVersion)
    assert(s.operation == "merge")
    assert(filesBefore.subsetOf(s.files.map(_.path).toSet)) // old files intact
    assert(s.deleteFiles.nonEmpty)
    // reference semantics: unmatched base rows ∪ all update rows
    val expect = base.join(updates.select("event_id"), Seq("event_id"), "left_anti")
      .unionByName(updates)
    assert(t.read().count() == expect.count())
    assert(math.abs(t.read().agg(sum($"value")).head().getDouble(0)
      - expect.agg(sum($"value")).head().getDouble(0)) < 1e-6)
    assert(t.read().filter($"event_id" === 700).head().getAs[Double]("value")
      == updates.filter($"event_id" === 700).head().getAs[Double]("value"))
  }

  // ---------------------------------------------------------------- (g)
  test("copy-on-write UPDATE/MERGE refuse a live ledger loudly; work after compact") {
    val wh = scratch("mor-cow-wh")
    spark.conf.set("spark.sql.catalog.morcow", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.morcow.warehouse", wh)
    spark.sql("CREATE TABLE morcow.db.t (id BIGINT, v DOUBLE)")
    spark.range(300).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .writeTo("morcow.db.t").append()
    val t = SnapshotTable.load(spark, s"$wh/db/t")
    t.positionDelete(col("id") < 50)
    // the group-based rewrite's operation scan cannot apply the ledger
    // (it would resurrect deleted rows into the rewrite) — refuse with
    // the compact remedy rather than answer wrong
    val e = intercept[Exception] {
      spark.sql("UPDATE morcow.db.t SET v = v + 1000 WHERE id < 100")
    }
    assert(e.getMessage.contains("compact"))
    // metadata-convertible DELETE still works (readVersion applies deletes)
    spark.sql("DELETE FROM morcow.db.t WHERE id >= 290")
    assert(spark.sql("SELECT count(*) c FROM morcow.db.t").head().getLong(0) == 240)
    // after folding, the same UPDATE succeeds and the dead rows stay dead
    t.compact(targetBytes = 1L << 20)
    spark.sql("UPDATE morcow.db.t SET v = v + 1000 WHERE id < 100")
    assert(spark.sql("SELECT count(*) c FROM morcow.db.t WHERE v >= 1000")
      .head().getLong(0) == 50) // exactly ids 50..99
    assert(spark.sql("SELECT min(id) m FROM morcow.db.t").head().getLong(0) == 50)
  }

  // ---------------------------------------------------------------- (h)
  test("incremental/streaming surfaces refuse ranges crossing a MOR commit") {
    val loc = scratch("mor-incr")
    val t = SnapshotTable.create(spark, loc, events.filter($"event_id" < 500))
    val v0 = t.latestVersion
    t.append(events.filter($"event_id" >= 500 && $"event_id" < 600))
    t.positionDelete($"event_id" < 100)
    val e = intercept[IllegalArgumentException] {
      t.appendsSince(v0).count()
    }
    assert(e.getMessage.contains("delete"))
  }

  // ---------------------------------------------------------------- (i)
  test("changes(): exact row-level CDC across append, MOR delete, and merge") {
    val loc = scratch("mor-changes")
    val t = SnapshotTable.create(spark, loc,
      spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v"))     // v0
    t.append(spark.range(100, 150).selectExpr("id", "CAST(id AS DOUBLE) AS v")) // v1
    t.positionDelete(col("id") < 10)                                    // v2
    t.mergeMor(spark.range(140, 160)
      .selectExpr("id", "CAST(id AS DOUBLE) + 0.5 AS v"), Seq("id"))    // v3

    val ch = t.changes(-1).cache()
    try {
      // v0: the create itself is 100 inserts
      assert(ch.filter($"_commit_version" === 0 && $"_change_type" === "insert")
        .count() == 100)
      // v1: 50 inserts
      assert(ch.filter($"_commit_version" === 1 && $"_change_type" === "insert")
        .count() == 50)
      assert(ch.filter($"_commit_version" === 1 && $"_change_type" === "delete")
        .count() == 0)
      // v2: 10 deletes, row-exact
      val d2 = ch.filter($"_commit_version" === 2)
      assert(d2.agg(collect_set($"_change_type")).head().getSeq[String](0) == Seq("delete"))
      assert(d2.select("id").as[Long].collect().sorted.toSeq == (0L until 10L))
      // v3: matched ids 140..149 deleted, all 20 update rows inserted
      val v3 = ch.filter($"_commit_version" === 3)
      assert(v3.filter($"_change_type" === "delete").select("id").as[Long]
        .collect().sorted.toSeq == (140L until 150L))
      assert(v3.filter($"_change_type" === "insert").count() == 20)
      assert(v3.filter($"_change_type" === "insert" && $"id" === 145)
        .head().getAs[Double]("v") == 145.5)
      // replaying the changelog reproduces the table state
      val replayed = ch
        .groupBy("id")
        .agg(sum(when($"_change_type" === "insert", 1).otherwise(-1)).as("net"))
        .filter($"net" > 0)
        .count()
      assert(replayed == t.read().count())
    } finally ch.unpersist()
  }

  // ---------------------------------------------------------------- (j)
  test("changes(): rollback past a MOR delete reports the resurrected rows") {
    val loc = scratch("mor-rollback")
    val t = SnapshotTable.create(spark, loc,
      spark.range(50).selectExpr("id", "CAST(id AS DOUBLE) AS v")) // v0
    t.positionDelete(col("id") < 5)                                // v1
    t.rollbackTo(0)                                                // v2
    assert(t.read().count() == 50)
    val ch = t.changes(1) // just the rollback commit
    assert(ch.filter($"_change_type" === "insert").select("id").as[Long]
      .collect().sorted.toSeq == (0L until 5L))
    assert(ch.filter($"_change_type" === "delete").count() == 0)
  }

  // ---------------------------------------------------------------- (k)
  test("expiration and orphan GC treat delete files as referenced content") {
    val loc = scratch("mor-gc")
    val t = SnapshotTable.create(spark, loc,
      spark.range(200).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.positionDelete(col("id") < 20)
    t.append(spark.range(200, 220).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    val delPaths = t.snapshot(t.latestVersion).deleteFiles.map(_.path)
    // orphan sweep with zero grace: live delete files must survive
    val removed = t.removeOrphans(graceMs = 0L)
    assert(removed.intersect(delPaths).isEmpty)
    t.expireSnapshots(keepLast = 1)
    delPaths.foreach(p =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    assert(t.read().count() == 200) // 180 survivors + 20 appended
  }

  // ---------------------------------------------------------------- (m)
  test("position deletes on a bucket-partitioned table: pruned scan, exact read") {
    val loc = scratch("mor-bucketed")
    val t = SnapshotTable.create(spark, loc,
      spark.range(2000).selectExpr("id", "id % 40 AS k", "CAST(id AS DOUBLE) AS v"),
      partitionCols = Seq("bucket(8,k)"))
    val filesBefore = t.snapshot(t.latestVersion).files.map(_.path)
    // key-equality predicate: candidate files prune to the key's bucket
    val n = t.positionDelete(col("k") === 7)
    assert(n == 50)
    val s = t.snapshot(t.latestVersion)
    assert(s.files.map(_.path) == filesBefore)
    assert(t.read().count() == 1950)
    assert(t.read().filter(col("k") === 7).count() == 0)
    assert(t.read().filter(col("k") === 8).count() == 50)
    // compact folds on the partitioned layout too
    t.compact(targetBytes = 1L << 20)
    assert(!t.hasDeletes && t.read().count() == 1950)
  }

  // ---------------------------------------------------------------- (n)
  test("merge-on-read composes with RENAME COLUMN generations") {
    val loc = scratch("mor-rename")
    val t = SnapshotTable.create(spark, loc,
      spark.range(500).selectExpr("id", "CAST(id AS DOUBLE) AS amount"))
    t.renameColumn("amount", "value") // files still store 'amount'
    // delete THROUGH the renamed name: the metadata read resolves the
    // old physical column per generation, positions land correctly
    val n = t.positionDelete(col("value") < 100)
    assert(n == 100)
    assert(t.read().count() == 400)
    assert(t.read().agg(min(col("value"))).head().getDouble(0) == 100.0)
    // new-generation appends coexist with the ledger
    t.append(spark.range(500, 600).selectExpr("id", "CAST(id AS DOUBLE) AS value"))
    assert(t.read().count() == 500)
  }

  // ---------------------------------------------------------------- (o)
  test("the changelog is SQL-reachable as the t.changes relation") {
    val wh = scratch("mor-changes-sql-wh")
    spark.conf.set("spark.sql.catalog.morch", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.morch.warehouse", wh)
    spark.sql("CREATE TABLE morch.db.t (id BIGINT, v DOUBLE)")
    spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v")
      .writeTo("morch.db.t").append()                       // v1
    val t = SnapshotTable.load(spark, s"$wh/db/t")
    t.positionDelete(col("id") < 10)                        // v2
    // full history through plain SQL
    val byType = spark.sql(
      """SELECT _change_type, count(*) AS n FROM morch.db.t.changes
        |GROUP BY 1 ORDER BY 1""".stripMargin).collect()
    assert(byType.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("delete", 10L), ("insert", 100L)))
    // bounded range through reader options
    val delta = spark.read.option("since_version", "1")
      .table("morch.db.t.changes")
    assert(delta.count() == 10)
    assert(delta.agg(collect_set(col("_change_type"))).head()
      .getSeq[String](0) == Seq("delete"))
    assert(delta.agg(max(col("id"))).head().getLong(0) == 9)
  }

  // ---------------------------------------------------------------- (l)
  test("clone and concurrent-rewrite guards refuse a live ledger loudly") {
    val loc = scratch("mor-guards")
    val t = SnapshotTable.create(spark, loc,
      spark.range(100).selectExpr("id", "CAST(id AS DOUBLE) AS v"))
    t.positionDelete(col("id") === 7)
    val e = intercept[IllegalArgumentException] {
      t.cloneTo(scratch("mor-guards-clone"))
    }
    assert(e.getMessage.contains("position-delete"))
    // after folding, clone works again
    t.compact(targetBytes = 1L << 20)
    assert(t.cloneTo(scratch("mor-guards-clone2")).read().count() == 99)
  }
}
