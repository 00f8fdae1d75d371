package graft.sources

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class FixtureGenSpec extends SparkFunSuite {

  private def events = graft.Tables.load(spark, sf, "events")

  test("small-files layout: year/month/day/hour/minute dirs, pruning works") {
    val dir = scratch("fixture-small")
    FixtureGen.smallFiles(spark, events, dir, days = 3)
    val back = spark.read.parquet(dir)
    assert(Seq("year", "month", "day", "hour", "minute")
      .forall(back.columns.contains))
    // row preservation over the window
    val upper = to_date(lit(graft.Tables.Anchor.take(10)))
    val expected = events
      .filter(to_date(col("ts")) >= date_sub(upper, 3) && to_date(col("ts")) < upper)
      .count()
    assert(back.count() == expected)
    // partition pruning on the date components reaches the scan
    val plan = back.filter(col("day") === 29 && col("month") === 1)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters:") && plan.contains("(day"),
      s"no partition filter in:\n$plan")
  }

  test("large-files layout: a few files per day directory") {
    val dir = scratch("fixture-large")
    FixtureGen.largeFiles(spark, events, dir, filesPerDay = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == events.count())
    val dayDir = new java.io.File(s"$dir/year=2024/month=1/day=15")
    assert(dayDir.isDirectory)
    val files = dayDir.listFiles().count(_.getName.endsWith(".parquet"))
    assert(files >= 1 && files <= 4, s"expected 1..4 files, got $files")
  }

  test("small-files query degrades vs compacted (the reference's story)") {
    val dir = scratch("fixture-degrade")
    FixtureGen.smallFiles(spark, events, dir, days = 7)
    val nFiles = {
      def walk(f: java.io.File): Long =
        if (f.isFile) { if (f.getName.endsWith(".parquet")) 1L else 0L }
        else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
      walk(new java.io.File(dir))
    }
    assert(nFiles > 50, s"expected many small files, got $nFiles")
    // compaction via the snapshot table collapses them
    val t = graft.table.SnapshotTable.create(spark, scratch("fixture-compacted"),
      spark.read.parquet(dir))
    t.compact(targetBytes = 256L * 1024 * 1024)
    assert(t.snapshot(t.latestVersion).files.size < nFiles / 10)
    assert(t.read().count() == spark.read.parquet(dir).count())
  }
}
