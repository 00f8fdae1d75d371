package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The q55 shape end-to-end: a day-partitioned catalog table over the
  * events data must scan only the partitions a day predicate selects. */
class PartitionPruningSpec extends SparkFunSuite {

  test("day-partitioned events table prunes non-matching partitions") {
    val wh = scratch("ppx-wh")
    spark.conf.set("spark.sql.catalog.ppx", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.ppx.warehouse", wh)
    spark.sql(
      """CREATE TABLE ppx.db.ev_days
        |  (event_id BIGINT, user_id BIGINT, event_type STRING, day DATE, value DOUBLE)
        |PARTITIONED BY (day)""".stripMargin)
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"), col("value"))
      .writeTo("ppx.db.ev_days").append()

    val t = SnapshotTable.load(spark, s"$wh/db/ev_days")
    val nDays = t.snapshot(t.latestVersion).files
      .flatMap(_.stats.get("day").map(_.min)).distinct.size
    assert(nDays >= 25, s"expected ~30 day partitions, got $nDays")

    def scanned(sql: String): Int =
      spark.sql(sql).queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          RuntimeFiltering.unwrap(b.scan).asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScan]
            .fileIndex.inputFiles.length
      }.sum

    val all = scanned("SELECT * FROM ppx.db.ev_days")
    val oneDay = scanned("SELECT * FROM ppx.db.ev_days WHERE day = DATE '2024-01-05'")
    val week = scanned(
      "SELECT * FROM ppx.db.ev_days WHERE day >= DATE '2024-01-24'")
    assert(oneDay * 10 <= all, s"one-day scan should touch ~1/30 of files: $oneDay of $all")
    assert(week < all / 2, s"one-week scan should prune most files: $week of $all")

    // pruned results stay correct
    val viaTable = spark.sql(
      "SELECT count(*) FROM ppx.db.ev_days WHERE day = DATE '2024-01-05'")
      .head().getLong(0)
    val direct = graft.Tables.load(spark, sf, "events")
      .filter(to_date(col("ts")) === "2024-01-05").count()
    assert(viaTable == direct)
  }

  private def mkDayTable(cat: String, name: String): String = {
    val wh = scratch(s"$cat-wh")
    spark.conf.set(s"spark.sql.catalog.$cat", classOf[GraftCatalog].getName)
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", wh)
    spark.sql(
      s"""CREATE TABLE $cat.db.$name
         |  (event_id BIGINT, user_id BIGINT, event_type STRING, day DATE, value DOUBLE)
         |PARTITIONED BY (day)""".stripMargin)
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("user_id"), col("event_type"),
        to_date(col("ts")).as("day"), col("value"))
      .writeTo(s"$cat.db.$name").append()
    wh
  }

  test("runtime IN filter re-prunes the file list (SupportsRuntimeV2Filtering)") {
    import org.apache.spark.sql.connector.expressions.Expressions
    import org.apache.spark.sql.connector.expressions.filter.Predicate
    mkDayTable("rfx", "ev_rt")

    val df = spark.table("rfx.db.ev_rt")
    val Seq(scan) = df.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    val g = scan.asInstanceOf[GraftRuntimeFilterable]
    assert(g.filterAttributes().map(_.fieldNames.mkString).toSet.contains("day"))
    val before = g.toBatch.planInputPartitions().length
    val total = g.currentFiles.size

    // the predicate shape DPP hands to filter(): IN over catalyst-internal
    // values (DATE = epoch days)
    val days = Seq("2024-01-05", "2024-01-06").map(d =>
      Expressions.literal(java.time.LocalDate.parse(d).toEpochDay.toInt)
        .asInstanceOf[org.apache.spark.sql.connector.expressions.Expression])
    g.filter(Array(new Predicate("IN", (Expressions.column("day")
      .asInstanceOf[org.apache.spark.sql.connector.expressions.Expression] +: days).toArray)))

    assert(g.currentFiles.size < total,
      s"runtime filter pruned nothing: ${g.currentFiles.size} of $total files")
    val after = g.toBatch.planInputPartitions().length
    assert(after < before, s"input partitions not reduced: $after of $before")
    // conservative pruning: the surviving files hold exactly the rows of
    // the two selected days (manifest rows-per-file is exact)
    val direct = graft.Tables.load(spark, sf, "events")
      .filter(to_date(col("ts")).isin("2024-01-05", "2024-01-06")).count()
    assert(g.currentFiles.map(_.rows).sum == direct)

    // formatted EXPLAIN keeps the inner scan's pushdown detail through
    // the wrapper (SupportsMetadata delegation)
    val explained = spark.table("rfx.db.ev_rt")
      .filter(col("day") === java.sql.Date.valueOf("2024-01-05"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(explained.contains("PushedFilters"), s"no PushedFilters in:\n$explained")
  }

  test("runtime filterAttributes are bounded to partition columns") {
    import graft.SparkSuite.spark.implicits._
    mkDayTable("hcx", "ev_hc")

    // every data file carries min/max stats for user_id/event_id/value,
    // but none of those may be advertised as runtime-filterable: a DPP
    // IN-list over a high-cardinality join key is driver-collected and
    // can be the whole key domain
    val Seq(scan) = spark.table("hcx.db.ev_hc").queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
    }
    val attrs = scan.asInstanceOf[GraftRuntimeFilterable]
      .filterAttributes().map(_.fieldNames.mkString).toSet
    assert(attrs == Set("day"), s"expected partition columns only, got $attrs")

    // a join keyed on user_id against a filtered dim therefore plans NO
    // runtime-filter subquery on the graft scan
    val dimPath = scratch("hcx-dim")
    (1L to 100L).map(u => (u, if (u <= 3) "keep" else "drop"))
      .toDF("d_user", "d_flag").write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath).filter($"d_flag" === "keep")
    val joined = spark.table("hcx.db.ev_hc").join(dim, $"user_id" === $"d_user")
    joined.collect()
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[GraftRuntimeFilterable] => Seq(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansIn(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansIn(s.plan)
      }.flatten
    val scans = scansIn(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no graft scan in the join plan")
    assert(scans.forall(_.runtimeFilters.isEmpty),
      "a runtime-filter subquery was planned on a high-cardinality key")
  }

  test("star join against a filtered dim triggers DPP on the graft scan") {
    import graft.SparkSuite.spark.implicits._
    mkDayTable("dpx", "ev_star")
    // dim: one row per day, a filter selecting exactly two days. Parquet-
    // backed (a LocalRelation dim gets its Filter constant-folded away
    // before PartitionPruning looks for a selective predicate)
    val dimPath = scratch("dpx-dim")
    (1 to 30).map(i => (java.sql.Date.valueOf(f"2024-01-$i%02d"),
      if (i <= 2) "keep" else "drop")).toDF("d_day", "d_flag")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    val joined = spark.table("dpx.db.ev_star").join(dim.filter($"d_flag" === "keep"),
      $"day" === $"d_day")
    val expected = graft.Tables.load(spark, sf, "events")
      .filter(to_date(col("ts")).isin("2024-01-01", "2024-01-02")).count()
    // collect() runs joined's OWN QueryExecution (count() would build a
    // separate aggregate plan whose scan is a different instance)
    assert(joined.collect().length == expected)
    // the planner inserted a runtime filter on the graft scan... (the
    // collect above ran the plan, so AQE's final plan is materialized)
    // AQE nests materialized stages in QueryStageExec nodes that TreeNode
    // traversal doesn't descend into — recurse through them explicitly
    def scansIn(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.datasources.v2.BatchScanExec] =
      p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec
            if b.scan.isInstanceOf[GraftRuntimeFilterable] => Seq(b)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scansIn(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scansIn(s.plan)
      }.flatten
    val scans = scansIn(joined.queryExecution.executedPlan)
    assert(scans.nonEmpty, "no graft scan in the join plan")
    assert(scans.exists(_.runtimeFilters.nonEmpty),
      "no dynamic-pruning filter was planned on the graft scan")
    // ...and execution actually shrank the file list to the two days
    val g = scans.head.scan.asInstanceOf[GraftRuntimeFilterable]
    val Seq(allFiles) = Seq(SnapshotTable.load(spark,
      s"${spark.conf.get("spark.sql.catalog.dpx.warehouse")}/db/ev_star"))
      .map(t => t.snapshot(t.latestVersion).files.size)
    assert(g.currentFiles.size < allFiles,
      s"DPP did not prune files at runtime: ${g.currentFiles.size} of $allFiles")
  }
}
