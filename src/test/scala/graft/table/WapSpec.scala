package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Branch / tag / write-audit-publish surface: branch-commit isolation,
  * `fast_forward` publish semantics (including the file re-stamping that
  * keeps published files correct across RENAME COLUMN), expiration's
  * tag-pinning and branch-live file protection (the data-loss-shaped
  * risks), the concurrent `create_branch` race, `spark.wap.branch` write
  * routing with its row-level/streaming refusals, and ref reads
  * (`VERSION AS OF 'name'`, the `t.refs` metadata table, the four SQL
  * procedures). */
class WapSpec extends SparkFunSuite {
  import spark.implicits._

  private def events = graft.Tables.load(spark, sf, "events")

  // ---------------------------------------------------------------- (a)
  test("branch commits are invisible to main until fastForward publishes them atomically") {
    val loc = scratch("wap-isolation")
    val t = SnapshotTable.create(spark, loc, events.filter($"event_id" < 600))
    t.createBranch("audit")
    val b = t.branch("audit")
    b.append(events.filter($"event_id" >= 600))

    // audit step sees the staged state; every main reader still sees v0
    assert(b.read().count() == events.count())
    assert(t.read().count() == 600)
    assert(t.latestVersion == 0)

    // publish: one atomic main commit adopting the branch head
    val v = t.fastForward("audit")
    assert(v == 1)
    assert(t.read().count() == events.count())
    assert(t.history().orderBy("version").collect()
      .map(_.getAs[String]("operation")).toSeq == Seq("append", "fast_forward"))
    // time travel over the publish still works
    assert(t.readVersion(0).count() == 600)
  }

  // ---------------------------------------------------------------- (b)
  test("fastForward aborts when main moved since the branch was created") {
    val loc = scratch("wap-ff-abort")
    val t = SnapshotTable.create(spark, loc, events.limit(100))
    t.createBranch("audit")
    t.branch("audit").append(events.limit(10))
    t.append(events.limit(5)) // concurrent main commit
    val mainRows = t.read().count()
    intercept[java.util.ConcurrentModificationException] {
      t.fastForward("audit")
    }
    // main is untouched by the aborted publish
    assert(t.read().count() == mainRows)
    assert(t.latestVersion == 1)
  }

  // ---------------------------------------------------------------- (c)
  test("fastForward re-stamps branch files safely across RENAME COLUMN history") {
    val loc = scratch("wap-ff-rename")
    // v0 under original names, v1 renames value -> amount: live v0 files
    // physically store "value" and resolve through the rename log
    val t = SnapshotTable.create(spark, loc, events.filter($"event_id" < 500))
    t.renameColumn("value", "amount")
    assert(t.latestVersion == 1)

    // branch AFTER the rename; branch files physically store "amount"
    t.createBranch("audit")
    val b = t.branch("audit")
    b.append(events.filter($"event_id" >= 500).withColumnRenamed("value", "amount"))
    val v = t.fastForward("audit")
    assert(v == 2)

    // every row resolves its amount: pre-rename files map value->amount,
    // published branch files read natively
    val now = t.read()
    assert(now.columns.contains("amount"))
    assert(now.filter($"amount".isNull).count() == 0)
    assert(now.count() == events.count())

    // a rename committed LATER than the publish must classify published
    // files as storing "amount" (their re-stamped generation), not the
    // original "value" — the exact mis-resolution the re-stamp prevents
    t.renameColumn("amount", "amt")
    val later = t.read()
    assert(later.filter($"amt".isNull).count() == 0)
    val expected = events.agg(sum($"value".cast("decimal(18,2)"))).head().getDecimal(0)
    assert(later.agg(sum($"amt".cast("decimal(18,2)"))).head().getDecimal(0) == expected)
  }

  // ---------------------------------------------------------------- (d)
  test("expireSnapshots never collects a tagged version") {
    val loc = scratch("wap-expire-tag")
    val t = SnapshotTable.create(spark, loc, events.limit(100)) // v0
    t.append(events.limit(50)) // v1
    t.append(events.limit(25)) // v2
    t.createTag("release-1", 0)
    t.expireSnapshots(keepLast = 1)
    // v0 pinned by the tag; v1 collected; v2 is the kept head
    assert(t.versions == Seq(0, 2), s"got ${t.versions}")
    assert(t.readVersion(0).count() == 100)
    assert(t.resolveRef("release-1").version == 0)
    assert(t.read().count() == 175)
  }

  test("expireSnapshots never deletes a data file a branch still references") {
    val loc = scratch("wap-expire-branch")
    val t = SnapshotTable.create(spark, loc, events.limit(100)) // v0
    t.createBranch("wip") // seeded at v0: references v0's files
    t.branch("wip").append(events.limit(10))
    t.overwrite(events.limit(7)) // v1: all-new files, v0's now main-dead
    val v0Files = t.snapshot(0).files.map(_.path)
    t.expireSnapshots(keepLast = 1)
    // v0 left main's history, but its files are branch-live — a bug here
    // DELETES data a reader of 'wip' still needs
    assert(t.versions == Seq(1))
    assert(v0Files.forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))),
      "expiration deleted branch-referenced data files")
    assert(t.branch("wip").read().count() == 110)
    assert(t.read().count() == 7)
  }

  // ---------------------------------------------------------------- (e)
  test("concurrent createBranch resolves to exactly one winner") {
    val loc = scratch("wap-branch-race")
    val t = SnapshotTable.create(spark, loc, events.limit(50))
    val wins = new java.util.concurrent.atomic.AtomicInteger
    val losses = new java.util.concurrent.atomic.AtomicInteger
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        try { SnapshotTable.load(spark, loc).createBranch("race"); wins.incrementAndGet() }
        catch { case _: IllegalArgumentException => losses.incrementAndGet() }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(wins.get() == 1, s"wins=${wins.get()} losses=${losses.get()}")
    assert(losses.get() == 3)
    assert(t.refs == Map("race" -> ("branch", 0)))
  }

  test("ref namespace is shared: tag vs branch collisions and bad names are refused") {
    val loc = scratch("wap-ref-names")
    val t = SnapshotTable.create(spark, loc, events.limit(10))
    t.createBranch("audit")
    t.createTag("release", 0)
    intercept[IllegalArgumentException](t.createTag("audit", 0))
    intercept[IllegalArgumentException](t.createBranch("release"))
    intercept[IllegalArgumentException](t.createBranch("main"))
    intercept[IllegalArgumentException](t.createTag("../escape", 0))
    // tags are immutable: re-pointing is refused, drop+recreate moves one
    t.append(events.limit(5))
    intercept[IllegalArgumentException](t.createTag("release", 1))
    t.dropRef("release")
    t.createTag("release", 1)
    assert(t.tagVersion("release") == 1)
  }

  test("branch handles refuse ref management and schema evolution") {
    val loc = scratch("wap-branch-guard")
    val t = SnapshotTable.create(spark, loc, events.limit(10))
    t.createBranch("audit")
    val b = t.branch("audit")
    intercept[IllegalArgumentException](b.createBranch("nested"))
    intercept[IllegalArgumentException](b.createTag("t", 0))
    intercept[IllegalArgumentException](b.fastForward("other"))
    intercept[IllegalArgumentException](b.expireSnapshots(1))
    // schema evolution on a branch would smuggle a schema change past
    // main's readers at publish time — refused
    intercept[IllegalArgumentException](b.renameColumn("value", "v2"))
  }

  test("dropRef removes a branch; its files become orphans, not instant deletes") {
    val loc = scratch("wap-dropref")
    val t = SnapshotTable.create(spark, loc, events.limit(20))
    val mainFiles = t.snapshot(t.latestVersion).files.map(_.path).toSet
    t.createBranch("wip")
    t.branch("wip").append(events.limit(5))
    val branchOnly = {
      val b = t.branch("wip")
      b.snapshot(b.latestVersion).files.map(_.path).toSet -- mainFiles
    }
    assert(branchOnly.nonEmpty)
    t.dropRef("wip")
    assert(t.refs.isEmpty)
    intercept[IllegalArgumentException](t.branch("wip"))
    // never deleted inline — a concurrent reader finishes its scan; the
    // next orphan sweep reclaims the branch-only files
    assert(branchOnly.forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    val removed = t.removeOrphans(graceMs = 0).toSet
    // the sweep reclaimed exactly the former branch-only files: gone from
    // disk, reported removed, and main's files survived untouched
    assert(branchOnly.subsetOf(removed),
      s"sweep missed ${branchOnly -- removed}")
    assert(branchOnly.forall(p => !java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    assert(mainFiles.forall(p => java.nio.file.Files.exists(java.nio.file.Paths.get(p))))
    assert(t.read().count() == 20)
  }

  // ------------------------------------------------------- (f) + (g): SQL
  private lazy val wh: String = {
    val w = scratch("wap-wh")
    spark.conf.set("spark.sql.catalog.wap", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.wap.warehouse", w)
    w
  }

  test("spark.wap.branch routes batch writes to the branch; refusals fire; fast_forward publishes") {
    graft.Tables.deleteRecursively(s"$wh/db/w")
    spark.sql("CREATE TABLE wap.db.w (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO wap.db.w VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    spark.sql("CALL wap.system.create_branch(table => 'db.w', name => 'audit')")
    spark.conf.set("spark.wap.branch", "audit")
    try {
      // INSERT lands on the branch chain; main readers see nothing
      spark.sql("INSERT INTO wap.db.w VALUES (4, 4.0), (5, 5.0)")
      // DELETE reads AND rewrites the branch, self-contained
      spark.sql("DELETE FROM wap.db.w WHERE id = 1")
      // UPDATE/MERGE plan their scan against main — refused under WAP
      val up = intercept[Exception](spark.sql("UPDATE wap.db.w SET v = 9.0 WHERE id = 2"))
      assert(up.getMessage.contains("spark.wap.branch"))
    } finally spark.conf.unset("spark.wap.branch")

    val t = SnapshotTable.load(spark, s"$wh/db/w")
    assert(spark.table("wap.db.w").select(sum($"id")).head().getLong(0) == 6) // 1+2+3
    assert(t.branch("audit").read().select(sum($"id")).head().getLong(0) == 14) // 2+3+4+5

    // VERSION AS OF 'ref' reads the branch head / tag pin through SQL (g)
    assert(spark.sql("SELECT sum(id) FROM wap.db.w VERSION AS OF 'audit'")
      .head().getLong(0) == 14)
    spark.sql("CALL wap.system.create_tag(table => 'db.w', name => 'pre-publish')")
    assert(spark.sql("SELECT sum(id) FROM wap.db.w VERSION AS OF 'pre-publish'")
      .head().getLong(0) == 6)

    // t.refs metadata table lists both refs (g)
    val refs = spark.sql("SELECT * FROM wap.db.w.refs ORDER BY name").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSeq
    assert(refs.map(r => (r._1, r._2)) == Seq(("audit", "branch"), ("pre-publish", "tag")))

    // publish through SQL; main atomically adopts the audited state
    val pub = spark.sql("CALL wap.system.fast_forward(table => 'db.w', branch => 'audit')").head()
    assert(spark.table("wap.db.w").select(sum($"id")).head().getLong(0) == 14)
    assert(spark.sql(s"SELECT sum(id) FROM wap.db.w VERSION AS OF ${pub.getInt(0) - 1}")
      .head().getLong(0) == 6)
    spark.sql("CALL wap.system.drop_ref(table => 'db.w', name => 'audit')")
    assert(spark.sql("SELECT count(*) FROM wap.db.w.refs").head().getLong(0) == 1)
  }

  test("non-convertible DELETE under spark.wap.branch refuses at scan build") {
    // the refusal the routing test does NOT cover: a DELETE whose
    // predicate cannot convert to a metadata-only delete (IN-subquery)
    // reaches the deferred build()-time refuseWap — the guard that
    // depends on the optimizer rule ordering, pinned here against it
    // silently reading main's scan and committing to the branch
    graft.Tables.deleteRecursively(s"$wh/db/nc")
    spark.sql("CREATE TABLE wap.db.nc (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO wap.db.nc VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    spark.sql("CALL wap.system.create_branch(table => 'db.nc', name => 'audit')")
    spark.conf.set("spark.wap.branch", "audit")
    try {
      val ex = intercept[Exception] {
        spark.sql(
          "DELETE FROM wap.db.nc WHERE id IN (SELECT id FROM wap.db.nc WHERE v > 1.5)")
      }
      def chain(e: Throwable): Seq[Throwable] =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(ex).exists(c => c.getMessage != null &&
        c.getMessage.contains("spark.wap.branch") &&
        c.getMessage.contains("metadata-only")),
        s"wrong failure: $ex")
    } finally spark.conf.unset("spark.wap.branch")
    // both chains unchanged by the refused DELETE
    val t = SnapshotTable.load(spark, s"$wh/db/nc")
    assert(spark.table("wap.db.nc").count() == 3)
    assert(t.branch("audit").read().count() == 3)
  }

  test("streaming writes refuse spark.wap.branch instead of ignoring it") {
    graft.Tables.deleteRecursively(s"$wh/db/s")
    spark.sql("CREATE TABLE wap.db.s (id BIGINT)")
    val t = SnapshotTable.load(spark, s"$wh/db/s")
    t.append(spark.range(3).toDF("id"))
    t.createBranch("audit")
    val src = scratch("wap-stream-src")
    spark.range(2).toDF("id").write.parquet(src)
    val schema = spark.read.parquet(src).schema
    spark.conf.set("spark.wap.branch", "audit")
    try {
      val ex = intercept[Exception] {
        spark.readStream.schema(schema).parquet(src)
          .writeStream
          .option("checkpointLocation", scratch("wap-stream-ckpt"))
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .toTable("wap.db.s")
          .awaitTermination(30000)
      }
      def chain(e: Throwable): Seq[Throwable] =
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq
      assert(chain(ex).exists(c =>
        c.getMessage != null && c.getMessage.contains("spark.wap.branch")),
        s"wrong failure: $ex")
    } finally spark.conf.unset("spark.wap.branch")
    // main unchanged by the refused stream
    assert(spark.table("wap.db.s").count() == 3)
  }
}
