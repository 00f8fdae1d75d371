package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Manifest segmentation ([[SnapshotTable.Snapshot.manifestRefs]]): above
  * the inline threshold, commits write chunk files and reuse intact base
  * chunks by reference — the Iceberg manifest-list idea that keeps commit
  * metadata O(changed files) instead of O(table files). */
class ManifestChunkSpec extends SparkFunSuite {

  private def events() = graft.Tables.load(spark, sf, "events")
    .select(col("event_id"), col("user_id"), col("value"))

  private def snapJson(t: SnapshotTable, v: Int): String =
    java.nio.file.Files.readString(java.nio.file.Paths.get(
      t.location, "_snapshots", f"v$v%05d.json"))

  test("appends above the threshold reuse base chunks and write one new chunk") {
    val loc = scratch("mc-append")
    val t = SnapshotTable.create(spark, loc, events().repartition(8))
    t.setProperties(Map(SnapshotTable.ManifestInlineMax -> "4"))
    // first over-threshold commit: everything goes into fresh chunks
    t.append(events().limit(200).repartition(3))
    val s1 = t.snapshot(t.latestVersion)
    assert(s1.manifestRefs.nonEmpty)
    assert(s1.files.size == 11)
    // the DOCUMENT carries refs only — no inline file entries
    assert(!snapJson(t, s1.version).contains("\"files\""))
    // second append: every chunk of s1 is reused BY REFERENCE, exactly
    // the new files land in new chunks
    t.append(events().limit(100).repartition(2))
    val s2 = t.snapshot(t.latestVersion)
    assert(s1.manifestRefs.forall(s2.manifestRefs.contains),
      "append must reuse every intact base chunk by reference")
    val newRefs = s2.manifestRefs.filterNot(s1.manifestRefs.contains)
    assert(newRefs.size == 1)
    assert(SnapshotTable.readChunk(newRefs.head).size == 2)
    // round trip: a FRESH instance (cold caches) materializes the same list
    val t2 = SnapshotTable.load(spark, loc)
    assert(t2.snapshot(s2.version).files == s2.files)
    assert(t2.read().count() == events().count() + 300)
  }

  test("commit document size stays O(changed), not O(table)") {
    val loc = scratch("mc-docsize")
    val t = SnapshotTable.create(spark, loc, events().repartition(64))
    t.setProperties(Map(SnapshotTable.ManifestInlineMax -> "4"))
    t.append(events().limit(10).repartition(1)) // chunks the 64+1
    val big = snapJson(t, t.latestVersion).length
    t.append(events().limit(10).repartition(1))
    val next = snapJson(t, t.latestVersion).length
    // the next append's document adds ONE ref line over the previous —
    // far below the size of re-rendering 60+ inline file entries
    assert(next - big < 200,
      s"append document grew by ${next - big} bytes — manifest not reused?")
  }

  test("rewrites invalidate only the touched chunks; reads stay exact") {
    val loc = scratch("mc-rewrite")
    val e = events()
    // a deterministic extra slice (limit() is order-nondeterministic)
    val extra = e.filter(col("event_id") < 120)
      .withColumn("event_id", col("event_id") + 50000)
    val full = e.unionByName(extra)
    val t = SnapshotTable.create(spark, loc, e.repartition(6))
    t.setProperties(Map(SnapshotTable.ManifestInlineMax -> "4"))
    t.append(extra.repartition(3))
    val before = t.read().count()
    assert(before == full.count())
    // replaceWhere rewrites the matching files; survivors' chunks reuse
    t.replaceWhere(col("user_id") === 3,
      full.filter(col("user_id") === 3).withColumn("value", col("value") * 2))
    val expect = full.withColumn("value",
      when(col("user_id") === 3, col("value") * 2).otherwise(col("value")))
    assert(t.read().count() == expect.count())
    val got = t.read().agg(sum("value")).head().getDouble(0)
    val want = expect.agg(sum("value")).head().getDouble(0)
    assert(math.abs(got - want) < 1e-6 * math.abs(want))
    // compaction collapses to a small file set → back under the
    // threshold → inline document again
    t.compact(targetBytes = 256L * 1024 * 1024)
    assert(t.snapshot(t.latestVersion).manifestRefs.isEmpty)
    assert(t.read().count() == expect.count())
  }

  test("t.manifests exposes the chunk layer through SQL") {
    val wh = graft.Tables.scratch("test/mc-meta-wh")
    graft.Tables.deleteRecursively(wh)
    spark.conf.set("spark.sql.catalog.mcm", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.mcm.warehouse", wh)
    spark.sql("CREATE TABLE mcm.db.ev (event_id BIGINT, user_id BIGINT, value DOUBLE)")
    spark.sql("ALTER TABLE mcm.db.ev SET TBLPROPERTIES " +
      s"('${SnapshotTable.ManifestInlineMax}' = '4')")
    events().repartition(8).writeTo("mcm.db.ev").append()
    val rows = spark.sql(
      "SELECT entry_count, size_bytes FROM mcm.db.ev.manifests").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(0)).sum == 8)
    assert(rows.forall(_.getLong(1) > 0))
  }

  test("expiration sweeps chunks no surviving snapshot references") {
    val loc = scratch("mc-gc")
    val t = SnapshotTable.create(spark, loc, events().repartition(8))
    t.setProperties(Map(SnapshotTable.ManifestInlineMax -> "4"))
    t.append(events().limit(50).repartition(2))
    t.overwrite(events().limit(10).repartition(6)) // drops every chunked ref
    val deadRefs = t.snapshot(t.latestVersion - 1).manifestRefs
    assert(deadRefs.nonEmpty)
    // age the chunk files past the sweep's grace window
    deadRefs.foreach { r =>
      java.nio.file.Files.setLastModifiedTime(java.nio.file.Paths.get(r),
        java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - 2 * 3600L * 1000))
    }
    t.expireSnapshots(keepLast = 1)
    deadRefs.foreach(r => assert(
      !java.nio.file.Files.exists(java.nio.file.Paths.get(r)),
      s"expired chunk $r must be swept"))
    assert(t.read().count() == 10)
  }

  test("branches and fast_forward publish chunked state; WAP chunks survive drop_ref") {
    val loc = scratch("mc-branch")
    val e = events()
    val t = SnapshotTable.create(spark, loc, e.repartition(8))
    t.setProperties(Map(SnapshotTable.ManifestInlineMax -> "4"))
    t.append(e.limit(80).repartition(2)) // chunked head
    t.createBranch("audit")
    val b = t.branch("audit")
    b.append(e.limit(40).repartition(2))
    assert(b.read().count() == e.count() + 120)
    // main unchanged until publish
    assert(t.read().count() == e.count() + 80)
    t.fastForward("audit")
    assert(t.read().count() == e.count() + 120)
    t.dropRef("audit")
    // the published snapshot's chunks live under _snapshots/manifests,
    // not the dropped branch dir — reads survive drop_ref
    val fresh = SnapshotTable.load(spark, loc)
    assert(fresh.read().count() == e.count() + 120)
    fresh.snapshot(fresh.latestVersion).manifestRefs.foreach(r =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(r))))
  }

  test("repeated time-travel loads hit the chunk cache: one parse per chunk per JVM") {
    val loc = scratch("mc-cache")
    val t = SnapshotTable.create(spark, loc, events().repartition(8))
    t.setProperties(Map(SnapshotTable.ManifestInlineMax -> "4"))
    t.append(events().limit(200).repartition(3))
    val v = t.latestVersion
    assert(t.snapshot(v).manifestRefs.nonEmpty)
    val expect = t.readVersion(v).count() // first read warms the cache
    val before = SnapshotTable.chunkMisses.sum()
    // fresh instances re-parse the snapshot DOCUMENT, but the immutable
    // chunk files must come from the per-JVM cache — zero new reads, the
    // bound that keeps q07-style time-travel planning O(doc) after warmup
    (1 to 3).foreach { _ =>
      val t2 = SnapshotTable.load(spark, loc)
      assert(t2.readVersion(v).count() == expect)
    }
    assert(SnapshotTable.chunkMisses.sum() == before,
      "repeated loads of unchanged chunks must not re-read chunk files")
  }
}
