package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Zero-copy clone invariants: shared inodes (no bytes copied), full
  * independence after the clone point, and — the one that bites in
  * production — GC on either side never breaks the other. */
class CloneSpec extends SparkFunSuite {

  private def mkTable(name: String, n: Int = 1000): SnapshotTable = {
    val loc = scratch(s"clone/$name")
    SnapshotTable.create(spark, loc,
      graft.Tables.load(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "value")
        .limit(n))
  }

  test("clone reads identically and every data file is a hard link (zero copy)") {
    val src = mkTable("src1")
    val clone = src.cloneTo(scratch("clone/dst1"))
    assert(clone.read().count() == src.read().count())
    assert(clone.read().agg(sum("event_id")).head.getLong(0) ==
      src.read().agg(sum("event_id")).head.getLong(0))
    val snap = clone.snapshot(clone.latestVersion)
    assert(snap.operation == "clone")
    snap.files.foreach { f =>
      val nlink = Files.getAttribute(Paths.get(f.path), "unix:nlink")
        .asInstanceOf[Number].intValue()
      assert(nlink >= 2, s"${f.path} not hard-linked (nlink=$nlink)")
    }
  }

  test("clone and source evolve independently after the clone point") {
    val src = mkTable("src2", 500)
    val clone = src.cloneTo(scratch("clone/dst2"))
    import spark.implicits._
    clone.append(Seq((9999901L, 1L, "extra", 0.5))
      .toDF("event_id", "user_id", "event_type", "value"))
    assert(clone.read().count() == 501)
    assert(src.read().count() == 500) // source untouched by clone append
    src.append(Seq((9999902L, 2L, "extra", 0.5), (9999903L, 2L, "extra", 0.5))
      .toDF("event_id", "user_id", "event_type", "value"))
    assert(src.read().count() == 502)
    assert(clone.read().count() == 501) // clone untouched by source append
  }

  test("source-side compact + orphan GC cannot break the clone (inode refcount)") {
    val src = mkTable("src3", 800)
    val shared = src.snapshot(src.latestVersion).files.map(_.path)
    val clone = src.cloneTo(scratch("clone/dst3"))
    val expect = src.read().agg(sum("event_id")).head.getLong(0)
    // rewrite the source's live files and collect every pre-compact
    // version — the SOURCE-side directory entries of the shared files are
    // unlinked, and the clone's links must keep the inodes alive
    src.compact(targetBytes = 1L * 1024 * 1024)
    src.expireSnapshots(keepLast = 1)
    src.removeOrphans(graceMs = 0L)
    assert(shared.exists(p => !Files.exists(Paths.get(p))),
      "expected at least one source-side entry of a shared file to be unlinked")
    assert(clone.read().count() == 800)
    assert(clone.read().agg(sum("event_id")).head.getLong(0) == expect)
  }

  test("clone carries table properties; refs do NOT cross the clone point") {
    val src = mkTable("src4", 100)
    src.setProperties(Map(SnapshotTable.MinSnapshotsToKeep -> "4"))
    src.createBranch("audit")
    val clone = src.cloneTo(scratch("clone/dst4"))
    val snap = clone.snapshot(clone.latestVersion)
    assert(snap.properties(SnapshotTable.MinSnapshotsToKeep) == "4")
    assert(clone.refs.isEmpty) // fresh history, no carried refs
  }

  test("clone v0 is append-family (incremental reads work) and a partial-failure retry starts clean") {
    val src = mkTable("src6", 200)
    // debris from a hypothetical earlier clone attempt that died mid-link:
    // a data/ dir with junk but NO committed snapshot
    val target = scratch("clone/dst6")
    Files.createDirectories(Paths.get(target, "data"))
    Files.writeString(Paths.get(target, "data", "stale.parquet"), "junk")
    val clone = src.cloneTo(target) // retry must not trip on the debris
    assert(clone.read().count() == 200)
    import spark.implicits._
    clone.append(Seq((9999905L, 1L, "extra", 1.0))
      .toDF("event_id", "user_id", "event_type", "value"))
    // from-the-beginning incremental read crosses the clone's v0
    assert(clone.appendsSince(-1).count() == 201)
  }

  test("clone refuses while a rename mapping is active; compact-then-clone works") {
    val src = mkTable("src5", 100)
    src.renameColumn("value", "amount")
    val e = intercept[IllegalArgumentException] {
      src.cloneTo(scratch("clone/dst5a"))
    }
    assert(e.getMessage.contains("compact"), e.getMessage)
    src.compact(targetBytes = 1L * 1024 * 1024) // rewrites under current names
    val clone = src.cloneTo(scratch("clone/dst5b"))
    assert(clone.read().columns.contains("amount"))
    assert(clone.read().count() == 100)
  }
}
