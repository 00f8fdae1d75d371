package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Z-order compaction must (a) preserve content exactly and (b) give
  * file-stat pruning on BOTH clustering columns — the property
  * lexicographic range-clustering cannot provide for the trailing one. */
class ZOrderSpec extends SparkFunSuite {

  private def overlapping(t: SnapshotTable, c: String, lo: Double, hi: Double): Int =
    t.snapshot(t.latestVersion).files.count { f =>
      f.stats.get(c).forall(s => !(s.max.toDouble < lo || s.min.toDouble > hi))
    }

  test("z-order compaction prunes on both dimensions and preserves content") {
    val loc = scratch("zorder")
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val t = SnapshotTable.create(spark, loc, ev.repartition(4))
    val before = (t.read().count(), t.read().agg(sum("value")).head().getDouble(0))

    // small target → many files, so per-dimension locality is observable
    val totalBytes = t.snapshot(t.latestVersion).files.map(_.bytes).sum
    t.compact(targetBytes = math.max(totalBytes / 16, 1),
      zorderBy = Seq("user_id", "value"))
    val nFiles = t.snapshot(t.latestVersion).files.size
    assert(nFiles >= 8, s"expected >=8 z-ordered files, got $nFiles")

    // content unchanged
    assert(t.read().count() == before._1)
    assert(math.abs(t.read().agg(sum("value")).head().getDouble(0) - before._2) < 1e-6)

    // narrow predicates on EITHER dimension overlap only a fraction of
    // files: with ~16 files over 2 interleaved dims each file spans ~1/4
    // of each dimension's range
    val snap = t.snapshot(t.latestVersion)
    val uStats = snap.files.flatMap(_.stats.get("user_id"))
    val vStats = snap.files.flatMap(_.stats.get("value"))
    assert(uStats.size == nFiles && vStats.size == nFiles, "stats must cover all files")
    val (uLo, uHi) = (uStats.map(_.min.toDouble).min, uStats.map(_.max.toDouble).max)
    val (vLo, vHi) = (vStats.map(_.min.toDouble).min, vStats.map(_.max.toDouble).max)
    def narrow(lo: Double, hi: Double): (Double, Double) = {
      val mid = (lo + hi) / 2; val w = (hi - lo) / 20
      (mid - w, mid + w)
    }
    val (ua, ub) = narrow(uLo, uHi)
    val (va, vb) = narrow(vLo, vHi)
    val uHit = overlapping(t, "user_id", ua, ub)
    val vHit = overlapping(t, "value", va, vb)
    assert(uHit <= nFiles / 2, s"user_id range hit $uHit of $nFiles files")
    assert(vHit <= nFiles / 2, s"value range hit $vHit of $nFiles files")
  }

  test("range clustering only prunes the leading column (the z-order contrast)") {
    val loc = scratch("rangecluster")
    val ev = graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val t = SnapshotTable.create(spark, loc, ev.repartition(4))
    val totalBytes = t.snapshot(t.latestVersion).files.map(_.bytes).sum
    t.compact(targetBytes = math.max(totalBytes / 16, 1),
      clusterBy = Seq("user_id", "value"))
    val nFiles = t.snapshot(t.latestVersion).files.size
    assert(nFiles >= 8)
    val vStats = t.snapshot(t.latestVersion).files.flatMap(_.stats.get("value"))
    val (vLo, vHi) = (vStats.map(_.min.toDouble).min, vStats.map(_.max.toDouble).max)
    val mid = (vLo + vHi) / 2; val w = (vHi - vLo) / 20
    // trailing-column predicate overlaps (nearly) every range-clustered file
    val vHit = overlapping(t, "value", mid - w, mid + w)
    assert(vHit > nFiles / 2, s"expected trailing column not to prune: $vHit of $nFiles")
  }
}
