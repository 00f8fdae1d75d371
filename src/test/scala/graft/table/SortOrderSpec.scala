package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Write sort order (`write.sort-order` / Iceberg's `WRITE ORDERED BY`):
  * staged writes range-distribute + sort so manifest min/max on the sort
  * columns prune whole files; plain compaction honors it; explicit
  * z-order overrides it; the native ALTER spellings desugar. */
class SortOrderSpec extends SparkFunSuite {

  private def events() = graft.Tables.load(spark, sf, "events")
    .select(col("event_id"), col("user_id"), col("value"))

  test("sorted writes produce file-level-prunable layouts; unsorted do not") {
    val locU = scratch("so-unsorted")
    val tU = SnapshotTable.create(spark, locU, events().repartition(4))
    val locS = scratch("so-sorted")
    val tS = SnapshotTable.create(spark, locS, events().limit(0))
    tS.setProperties(Map(SnapshotTable.SortOrder -> "user_id"))
    tS.append(events().repartition(4))
    assert(tS.read().count() == events().count())
    // content identical regardless of layout (tolerance: double addition
    // order differs between the two layouts)
    val a = tS.read().agg(sum("value")).head().getDouble(0)
    val b = tU.read().agg(sum("value")).head().getDouble(0)
    assert(math.abs(a - b) < 1e-9 * math.abs(b))
    def kept(t: SnapshotTable): Int = {
      val snap = t.snapshot(t.latestVersion)
      StatsPruning.prune(snap.files.filter(_.rows > 0),
        Seq(org.apache.spark.sql.sources.EqualTo("user_id", 7L))).size
    }
    // random distribution: every unsorted file spans the full user range
    assert(kept(tU) == 4)
    // range-distributed: user 7 lives in a strict subset of the files
    val sortedFiles = tS.snapshot(tS.latestVersion).files.filter(_.rows > 0)
    assert(sortedFiles.size == 4)
    assert(kept(tS) < 4,
      "sorted layout must prune user_id=7 to fewer than all files")
  }

  test("plain compaction honors the sort order; zorder_by overrides it") {
    val loc = scratch("so-compact")
    val t = SnapshotTable.create(spark, loc, events().repartition(8))
    t.setProperties(Map(SnapshotTable.SortOrder -> "event_id"))
    // plain compact into ~4 files → event_id ranges disjoint
    t.compact(targetBytes = t.snapshot(t.latestVersion).files.map(_.bytes).sum / 4)
    val snap = t.snapshot(t.latestVersion)
    val withStats = snap.files.filter(f => f.rows > 0 && f.stats.contains("event_id"))
    assert(withStats.size >= 2)
    val ranges = withStats.map(f =>
        (f.stats("event_id").min.toLong, f.stats("event_id").max.toLong))
      .sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, aMax), (bMin, _)) =>
        assert(aMax <= bMin, s"overlapping sorted ranges: $ranges")
      case _ =>
    }
    assert(t.read().count() == events().count())
    // a z-ordered rewrite overrides the declared order for that rewrite
    // (no exception, content exact — ZOrderSpec grades the layout itself)
    t.compact(targetBytes = 4L * 1024 * 1024, zorderBy = Seq("user_id", "value"))
    assert(t.read().count() == events().count())
  }

  test("ALTER TABLE ... WRITE ORDERED BY / WRITE UNORDERED desugar; unknown columns refuse") {
    val shared = graft.SparkSuite.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-so-ddl")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(shared)
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val wh = graft.Tables.scratch("test/so-ddl-wh")
      graft.Tables.deleteRecursively(wh)
      s.conf.set("spark.sql.catalog.sodl", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.sodl.warehouse", wh)
      s.sql("CREATE TABLE sodl.db.ev (event_id BIGINT, user_id BIGINT, value DOUBLE)")
      s.sql("ALTER TABLE sodl.db.ev WRITE ORDERED BY (user_id, event_id)")
      val t = SnapshotTable.load(s, s"$wh/db/ev")
      assert(t.properties(SnapshotTable.SortOrder) == "user_id,event_id")
      // parenless spelling too
      s.sql("ALTER TABLE sodl.db.ev WRITE ORDERED BY value")
      assert(t.properties(SnapshotTable.SortOrder) == "value")
      s.sql("ALTER TABLE sodl.db.ev WRITE UNORDERED")
      assert(!t.properties.contains(SnapshotTable.SortOrder))
      val ex = intercept[Exception](
        s.sql("ALTER TABLE sodl.db.ev WRITE ORDERED BY nope"))
      assert(ex.getMessage.contains("unknown column"))
      // unbalanced parens must NOT silently desugar to SET TBLPROPERTIES —
      // they fall through to stock Spark's parse error, property untouched
      intercept[Exception](
        s.sql("ALTER TABLE sodl.db.ev WRITE ORDERED BY (user_id, value"))
      intercept[Exception](
        s.sql("ALTER TABLE sodl.db.ev WRITE ORDERED BY user_id)"))
      assert(!t.properties.contains(SnapshotTable.SortOrder))
      // direction/null-order modifiers get a targeted refusal, not a
      // generic parse error
      val exDesc = intercept[Exception](
        s.sql("ALTER TABLE sodl.db.ev WRITE ORDERED BY user_id DESC NULLS LAST"))
      assert(exDesc.getMessage.contains("modifiers"))
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(shared)
      org.apache.spark.sql.SparkSession.setDefaultSession(shared)
    }
  }
}
