package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Storage-partitioned join: two graft tables identity-partitioned the
  * same way must join with NO shuffle when the v2 bucketing conf is on
  * (the DSv2 co-partitioning path; a 100 TB fact-fact join's shuffle is
  * its dominant cost). Runs in its OWN SparkSession: the bucketing conf
  * changes which scan class every graft table builds, and suites share
  * one session — flipping it globally would race concurrently-running
  * suites that inspect scan internals. */
class KeyGroupedJoinSpec extends SparkFunSuite {

  // newSession() clones the conf but shares the SparkContext, so the
  // grouping flags are visible only to this suite. Broadcast joins are
  // DISABLED: at test scale every dim fits under the broadcast threshold
  // and a BroadcastHashJoin would make "zero shuffles" true without ever
  // exercising the co-partitioned join path — the assertions below must
  // prove a SORT-MERGE join over key-grouped scans needs no exchange.
  private lazy val s2: SparkSession = {
    val s = spark.newSession()
    s.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s.conf.set("spark.sql.graft.planning.preserveDataGrouping", "true")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s
  }

  private def sortMergeJoins(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collect {
      case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => 1
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        sortMergeJoins(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        sortMergeJoins(s.plan)
    }.sum

  private def mkTable(s: SparkSession, cat: String, name: String): Unit = {
    s.sql(
      s"""CREATE TABLE $cat.db.$name
         |  (event_id BIGINT, day DATE, value DOUBLE)
         |PARTITIONED BY (day)""".stripMargin)
    graft.Tables.load(s, sf, "events")
      .select(col("event_id"), to_date(col("ts")).as("day"), col("value"))
      .writeTo(s"$cat.db.$name").append()
  }

  private def shuffles(plan: org.apache.spark.sql.execution.SparkPlan): Int =
    plan.collect {
      case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => 1
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        shuffles(a.executedPlan)
      case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        shuffles(s.plan)
    }.sum

  private def expectedRows(s: SparkSession): Long = {
    val d = graft.Tables.load(s, sf, "events")
      .groupBy(to_date(col("ts")).as("day")).count()
    d.agg(sum(col("count") * col("count"))).head().getLong(0)
  }

  test("same-partitioned graft tables join with zero shuffles under SPJ") {
    val wh = scratch("spj-wh")
    s2.conf.set("spark.sql.catalog.spjx", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.spjx.warehouse", wh)
    mkTable(s2, "spjx", "ev_a")
    mkTable(s2, "spjx", "ev_b")

    val joined = s2.table("spjx.db.ev_a").as("a")
      .join(s2.table("spjx.db.ev_b").as("b"), "day")
    assert(joined.count() == expectedRows(s2))
    // groupBy("day") after the join also needs no exchange — the join
    // output is already day-partitioned
    val agg = s2.table("spjx.db.ev_a").as("a")
      .join(s2.table("spjx.db.ev_b").as("b"), "day")
      .groupBy("day").count()
    val rows = agg.collect()
    assert(rows.length >= 25)
    val plan = agg.queryExecution.executedPlan
    val nShuffles = shuffles(plan)
    assert(nShuffles == 0,
      s"expected a shuffle-free storage-partitioned join, found $nShuffles exchanges:\n$plan")
    // and it IS the co-partitioned sort-merge path — broadcast is off in
    // this session, so the zero-shuffle claim can't be satisfied trivially
    assert(sortMergeJoins(plan) == 1,
      s"expected a sort-merge join over key-grouped scans:\n$plan")
  }

  test("q62 (registry SPJ query) plans zero shuffle exchanges end-to-end") {
    // the registry entry itself — the exact query the driver verifies —
    // must be exchange-free: scans report KeyGroupedPartitioning, the
    // join is co-partitioned, the day-grouped aggregate reuses the
    // grouping, and the (unordered) output adds no range exchange
    val df = graft.queries.Ops.q62(spark, sf)
    df.collect()
    val nShuffles = shuffles(df.queryExecution.executedPlan)
    assert(nShuffles == 0,
      s"q62 expected a fully exchange-free plan, found $nShuffles:\n" +
        df.queryExecution.executedPlan)
  }

  test("compaction restores key-grouped scans after non-keyable rewrite files") {
    val wh = scratch("spj-rekey-wh")
    s2.conf.set("spark.sql.catalog.spjz", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.spjz.warehouse", wh)
    mkTable(s2, "spjz", "ev_r")
    val loc = s"$wh/db/ev_r"

    def scan(): org.apache.spark.sql.connector.read.Scan = {
      val Seq(sc) = s2.table("spjz.db.ev_r").queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }
      sc
    }
    val baseCount = s2.table("spjz.db.ev_r").count()
    val baseSum = s2.table("spjz.db.ev_r")
      .agg(sum(col("value").cast("decimal(18,2)"))).head().getDecimal(0)
    assert(scan().isInstanceOf[GraftKeyGroupedScan],
      "freshly written partitioned table should plan key-grouped")

    // a row-level UPDATE writes FLAT replacement files spanning many days
    // (min != max on the partition column) — eligibility is deliberately
    // all-or-nothing, so the whole table drops out of key-grouped planning
    s2.sql("UPDATE spjz.db.ev_r SET value = value + 1.0 WHERE event_id % 7 = 0")
    assert(!scan().isInstanceOf[GraftKeyGroupedScan],
      "flat rewrite files must disable key-grouped planning")

    // compact() rewrites every file through the identity-partitioned
    // staging layout → the evolved table regains SPJ
    SnapshotTable.load(s2, loc).compact()
    assert(scan().isInstanceOf[GraftKeyGroupedScan],
      "compaction should restore key-grouped eligibility")

    // rows survived the whole journey (update applied once, nothing lost)
    assert(s2.table("spjz.db.ev_r").count() == baseCount)
    val updated = s2.table("spjz.db.ev_r")
      .agg(sum(col("value").cast("decimal(18,2)"))).head().getDecimal(0)
    val nUpdated = s2.table("spjz.db.ev_r")
      .filter(col("event_id") % 7 === 0).count()
    assert(updated.subtract(baseSum).doubleValue() == nUpdated.toDouble)

    // and the re-keyed table joins shuffle-free against a co-partitioned one
    val joined = s2.table("spjz.db.ev_r").select(col("day"), col("event_id"))
      .join(s2.table("spjz.db.ev_r").select(col("day"), col("value")), "day")
      .groupBy("day").count()
    joined.collect()
    assert(shuffles(joined.queryExecution.executedPlan) == 0)
  }

  test("bucket-partitioned tables join on a high-cardinality key with zero shuffles") {
    val wh = scratch("spj-bucket-wh")
    s2.conf.set("spark.sql.catalog.spjb", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.spjb.warehouse", wh)
    def mkBucketed(name: String): Unit = {
      s2.sql(
        s"""CREATE TABLE spjb.db.$name
           |  (event_id BIGINT, user_id BIGINT, value DOUBLE)
           |PARTITIONED BY (bucket(8, user_id))""".stripMargin)
      graft.Tables.load(s2, sf, "events")
        .select(col("event_id"), col("user_id"), col("value"))
        .writeTo(s"spjb.db.$name").append()
    }
    mkBucketed("ev_a")
    mkBucketed("ev_b")

    // the write laid out one file per bucket id; the manifest carries the
    // id as min==max stats under the serialized field name
    val t = SnapshotTable.load(s2, s"$wh/db/ev_a")
    val buckets = t.snapshot(t.latestVersion).files
      .flatMap(_.stats.get("bucket(8,user_id)").map(_.min.toInt)).distinct.sorted
    assert(buckets.nonEmpty && buckets.forall(b => b >= 0 && b < 8),
      s"bucket ids out of range: $buckets")

    // identity partitioning can't do this join shuffle-free — user_id is
    // high-cardinality — but same-bucketed tables can: scans report
    // KeyGroupedPartitioning over bucket(8, user_id), resolved through
    // the catalog's FunctionCatalog, and the join co-locates
    val agg = s2.table("spjb.db.ev_a").as("a")
      .join(s2.table("spjb.db.ev_b").as("b"), "user_id")
      .groupBy("user_id").count()
    val rows = agg.collect()
    val expected = graft.Tables.load(s2, sf, "events")
      .groupBy("user_id").count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    assert(rows.map(_.getLong(1)).sum == expected)
    val nShuffles = shuffles(agg.queryExecution.executedPlan)
    assert(nShuffles == 0,
      s"expected a shuffle-free bucketed join, found $nShuffles exchanges:\n" +
        agg.queryExecution.executedPlan)

    // write layout matches the function-catalog bucket function exactly
    val probe = s2.table("spjb.db.ev_a")
      .select(col("user_id"), expr("pmod(hash(user_id), 8)").as("expect"))
      .limit(100).collect()
    probe.foreach { r =>
      assert(BucketFunction.bucketId(java.lang.Long.valueOf(r.getLong(0)), 8)
        == r.getInt(1), s"bucketId drifted from pmod(hash, n) for ${r.getLong(0)}")
    }
  }

  test("truncate partitioning: prefix layout prunes AND joins shuffle-free via truncate_w") {
    val wh = scratch("spj-trunc-wh")
    s2.conf.set("spark.sql.catalog.spjt", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.spjt.warehouse", wh)
    s2.sql(
      """CREATE TABLE spjt.db.ev_t
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |PARTITIONED BY (truncate(3, event_type))""".stripMargin)
    graft.Tables.load(s2, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .writeTo("spjt.db.ev_t").append()

    // one file per 3-char prefix group; manifest stats carry the prefix
    // under the serialized field name
    val t = SnapshotTable.load(s2, s"$wh/db/ev_t")
    val files = t.snapshot(t.latestVersion).files
    val prefixes = files
      .flatMap(_.stats.get("truncate(3,event_type)").map(_.min)).distinct
    assert(prefixes.nonEmpty && prefixes.forall(_.length <= 3), s"$prefixes")

    // the LAYOUT is the point: files are clustered by prefix, so the
    // source column's own footer stats are tight and an equality
    // predicate prunes to the matching prefix group's file(s)
    def scanned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          RuntimeFiltering.unwrap(b.scan)
            .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScan]
            .fileIndex.inputFiles.length
      }.sum
    val all = scanned(s2.table("spjt.db.ev_t"))
    val one = scanned(s2.table("spjt.db.ev_t")
      .filter(col("event_type") === "purchase"))
    assert(one < all, s"prefix clustering should prune files: $one of $all")

    // SPJ: the generic truncate(3, col) spelling keeps its width literal
    // as an expression leaf and can never satisfy a clustered
    // distribution, so the scan reports the width-baked truncate_3(col)
    // function (resolved through the catalog) — co-partitioned truncate
    // tables then sort-merge join with zero shuffles, like bucket
    s2.sql(
      """CREATE TABLE spjt.db.ev_t2
        |  (event_id BIGINT, event_type STRING, value DOUBLE)
        |PARTITIONED BY (truncate(3, event_type))""".stripMargin)
    graft.Tables.load(s2, sf, "events")
      .select(col("event_id"), col("event_type"), col("value"))
      .writeTo("spjt.db.ev_t2").append()
    val joined = s2.table("spjt.db.ev_t").select(col("event_type"), col("event_id"))
      .join(s2.table("spjt.db.ev_t2").select(col("event_type"), col("value")),
        "event_type")
    val n = joined.collect().length.toLong
    val expected = graft.Tables.load(s2, sf, "events")
      .groupBy("event_type").count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    assert(n == expected, s"truncate SPJ join returned $n of $expected rows")
    val plan = joined.queryExecution.executedPlan
    assert(shuffles(plan) == 0,
      s"expected a shuffle-free truncate-partitioned join:\n$plan")
    assert(sortMergeJoins(plan) == 1, s"expected the sort-merge SPJ path:\n$plan")

    // correctness through the truncated layout
    assert(s2.table("spjt.db.ev_t").count() ==
      graft.Tables.load(s2, sf, "events").count())
  }

  test("partially-clustered SPJ: a hot partition runs >1 task, still zero shuffles") {
    // the skew story: key-grouped planning normally caps each partition
    // VALUE at one task, so at 100× a hot day becomes one straggler.
    // With pushPartValues + partiallyClusteredDistribution Spark keeps
    // the larger side's same-key splits as separate tasks and replicates
    // the smaller side's groups over them — possible only because the
    // scan reports one keyed partition per FILE and lets Spark decide
    // the grouping.
    val s3 = spark.newSession()
    s3.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s3.conf.set("spark.sql.graft.planning.preserveDataGrouping", "true")
    s3.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s3.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    s3.conf.set(
      "spark.sql.sources.v2.bucketing.partiallyClusteredDistribution.enabled", "true")
    val wh = scratch("spj-skew-wh")
    s3.conf.set("spark.sql.catalog.spjs", classOf[GraftCatalog].getName)
    s3.conf.set("spark.sql.catalog.spjs.warehouse", wh)

    val ev = graft.Tables.load(s3, sf, "events")
      .select(col("event_id"), to_date(col("ts")).as("day"), col("value"))
    val hotDay = ev.groupBy("day").count().orderBy(desc("count"))
      .head().getDate(0)
    def mk(name: String): Unit = s3.sql(
      s"""CREATE TABLE spjs.db.$name
         |  (event_id BIGINT, day DATE, value DOUBLE)
         |PARTITIONED BY (day)""".stripMargin)
    mk("ev_big"); mk("ev_small")
    ev.writeTo("spjs.db.ev_big").append()
    // extra appends land extra FILES in the hot partition only (each
    // append writes one file per partition value it contains) — the
    // 10:1-ish skewed layout a hot key produces at scale
    (1 to 3).foreach { _ =>
      ev.filter(col("day") === hotDay).writeTo("spjs.db.ev_big").append()
    }
    ev.writeTo("spjs.db.ev_small").append()

    // assert on the JOIN plan itself: under partial clustering the same
    // key deliberately spans multiple output partitions, so an aggregate
    // ABOVE the join correctly needs its own exchange — the claim here is
    // that the join itself runs co-located and split
    val joined = s3.table("spjs.db.ev_big").select("day").as("a")
      .join(s3.table("spjs.db.ev_small").select("day").as("b"), "day")
    val n = joined.collect().length.toLong
    // correctness: per-day rows = bigRows(day) * smallRows(day), where
    // big has 4× the hot day's rows and small is the plain table
    val expected = {
      val big = ev.groupBy("day").count()
        .withColumn("big_count", when(col("day") === hotDay, col("count") * 4)
          .otherwise(col("count")))
      big.agg(sum(col("big_count") * col("count"))).head().getLong(0)
    }
    assert(n == expected, s"partially-clustered join returned $n of $expected rows")

    val plan = joined.queryExecution.executedPlan
    assert(shuffles(plan) == 0,
      s"expected a shuffle-free partially-clustered join, found exchanges:\n$plan")
    assert(sortMergeJoins(plan) == 1,
      s"expected the sort-merge SPJ path:\n$plan")
    // the hot key must NOT collapse to one task: scan RDDs carry more
    // partitions than there are distinct days
    val nDays = ev.select("day").distinct().count()
    def scanPartsOf(p: org.apache.spark.sql.execution.SparkPlan): Seq[Int] =
      p.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          Seq(b.inputRDD.getNumPartitions)
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scanPartsOf(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scanPartsOf(s.plan)
      }.flatten
    val scanParts = scanPartsOf(plan)
    assert(scanParts.nonEmpty && scanParts.forall(_ > nDays),
      s"hot partition still a single task: scan partitions $scanParts vs $nDays days")
  }

  test("days(ts) time transform: one slice per day, ts predicates prune, SPJ joins shuffle-free") {
    val wh = scratch("spj-days-wh")
    s2.conf.set("spark.sql.catalog.spjd", classOf[GraftCatalog].getName)
    s2.conf.set("spark.sql.catalog.spjd.warehouse", wh)
    def mk(name: String): Unit = {
      s2.sql(
        s"""CREATE TABLE spjd.db.$name
           |  (event_id BIGINT, ts TIMESTAMP, value DOUBLE)
           |PARTITIONED BY (days(ts))""".stripMargin)
      graft.Tables.load(s2, sf, "events")
        .select(col("event_id"), col("ts"), col("value"))
        .writeTo(s"spjd.db.$name").append()
    }
    mk("ev_a"); mk("ev_b")

    // layout: one file per calendar day, date-typed partition stats
    val t = SnapshotTable.load(s2, s"$wh/db/ev_a")
    val files = t.snapshot(t.latestVersion).files
    val nDays = graft.Tables.load(s2, sf, "events")
      .select(to_date(col("ts"))).distinct().count()
    assert(files.size == nDays, s"expected $nDays day files, got ${files.size}")
    assert(files.forall(_.path.contains("d_ts=")))
    assert(files.forall(_.stats.get("days(ts)").exists(s =>
      s.typ == "date" && s.min == s.max)))

    // correctness + day-sliced footer stats make ts range predicates prune
    assert(s2.table("spjd.db.ev_a").count() ==
      graft.Tables.load(s2, sf, "events").count())
    def scanned(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec =>
          RuntimeFiltering.unwrap(b.scan)
            .asInstanceOf[org.apache.spark.sql.execution.datasources.v2.FileScan]
            .fileIndex.inputFiles.length
      }.sum
    val cutoff = graft.Tables.load(s2, sf, "events")
      .agg(max(col("ts"))).head().getTimestamp(0)
    val hit = scanned(s2.table("spjd.db.ev_a")
      .filter(col("ts") >= java.sql.Timestamp.from(
        cutoff.toInstant.minus(java.time.Duration.ofDays(3)))))
    assert(hit < files.size, s"day slicing should prune ts ranges: $hit of ${files.size}")

    // SPJ: days(ts) resolved through the FunctionCatalog has one
    // attribute child, so a ts equi-join over co-partitioned day slices
    // sort-merge joins with zero shuffles
    val joined = s2.table("spjd.db.ev_a").select(col("ts"), col("event_id"))
      .join(s2.table("spjd.db.ev_b").select(col("ts"), col("value")), "ts")
    val n = joined.collect().length.toLong
    val expected = graft.Tables.load(s2, sf, "events")
      .groupBy("ts").count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    assert(n == expected, s"days SPJ join returned $n of $expected rows")
    val plan = joined.queryExecution.executedPlan
    assert(shuffles(plan) == 0,
      s"expected a shuffle-free days-partitioned join:\n$plan")
    assert(sortMergeJoins(plan) == 1, s"expected the sort-merge SPJ path:\n$plan")
  }

  test("SPJ with disjoint partition coverage: missing key groups stay shuffle-free and correct") {
    // the real 100 TB case after replaceWhere/delete or sparse ingest:
    // one side simply has NO files for some bucket values. Spark aligns
    // the mismatched partition-value sets only when pushPartValues is on
    // (the side missing a value gets an empty group instead of the whole
    // join degrading to a shuffle).
    val s4 = spark.newSession()
    s4.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    s4.conf.set("spark.sql.graft.planning.preserveDataGrouping", "true")
    s4.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s4.conf.set("spark.sql.sources.v2.bucketing.pushPartValues.enabled", "true")
    val wh = scratch("spj-sparse-wh")
    s4.conf.set("spark.sql.catalog.spjp", classOf[GraftCatalog].getName)
    s4.conf.set("spark.sql.catalog.spjp.warehouse", wh)

    val ev = graft.Tables.load(s4, sf, "events")
      .select(col("event_id"), col("user_id"), col("value"),
        expr("pmod(hash(user_id), 8)").as("b"))
    def mk(name: String, cond: org.apache.spark.sql.Column): Unit = {
      s4.sql(
        s"""CREATE TABLE spjp.db.$name
           |  (event_id BIGINT, user_id BIGINT, value DOUBLE)
           |PARTITIONED BY (bucket(8, user_id))""".stripMargin)
      ev.filter(cond).select("event_id", "user_id", "value")
        .writeTo(s"spjp.db.$name").append()
    }
    // A covers buckets 0-3 only, B covers 2-5: each side misses groups
    // the other has, and both miss 6-7 entirely
    mk("ev_lo", col("b") < 4)
    mk("ev_hi", col("b") >= 2 && col("b") < 6)
    def liveBuckets(name: String): Seq[Int] = {
      val t = SnapshotTable.load(s4, s"$wh/db/$name")
      t.snapshot(t.latestVersion).files
        .flatMap(_.stats.get("bucket(8,user_id)").map(_.min.toInt))
    }
    val aBuckets = liveBuckets("ev_lo")
    val bBuckets = liveBuckets("ev_hi")
    assert(aBuckets.toSet == Set(0, 1, 2, 3) && bBuckets.toSet == Set(2, 3, 4, 5),
      s"fixture coverage drifted: $aBuckets vs $bBuckets")

    // INNER join: only buckets 2-3 can match
    val inner = s4.table("spjp.db.ev_lo").select(col("user_id"), col("event_id"))
      .join(s4.table("spjp.db.ev_hi").select(col("user_id"), col("value")),
        "user_id")
    val nInner = inner.collect().length.toLong
    val expInner = ev.filter(col("b") >= 2 && col("b") < 4)
      .groupBy("user_id").count()
      .agg(sum(col("count") * col("count"))).head().getLong(0)
    assert(nInner == expInner, s"sparse inner join: $nInner of $expInner rows")
    val innerPlan = inner.queryExecution.executedPlan
    assert(shuffles(innerPlan) == 0,
      s"expected shuffle-free inner join over disjoint coverage:\n$innerPlan")
    assert(sortMergeJoins(innerPlan) == 1, s"expected the SMJ SPJ path:\n$innerPlan")

    // LEFT join: buckets 0-1 rows survive with NULL right side — the
    // missing right groups must yield nulls, not dropped rows
    val left = s4.table("spjp.db.ev_lo").select(col("user_id"), col("event_id"))
      .join(s4.table("spjp.db.ev_hi").select(col("user_id"), col("value")),
        Seq("user_id"), "left")
    val rows = left.collect()
    val unmatched = rows.count(_.isNullAt(2)).toLong
    val expUnmatched = ev.filter(col("b") < 2).count()
    assert(unmatched == expUnmatched,
      s"left join lost unmatched-bucket rows: $unmatched of $expUnmatched")
    assert(rows.length.toLong == expInner + expUnmatched)
    val leftPlan = left.queryExecution.executedPlan
    assert(shuffles(leftPlan) == 0,
      s"expected shuffle-free left join over disjoint coverage:\n$leftPlan")
  }

  test("SPJ off → same join still correct (runtime-filter scan path)") {
    val wh = scratch("spj-off-wh")
    spark.conf.set("spark.sql.catalog.spjy", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.spjy.warehouse", wh)
    mkTable(spark, "spjy", "ev_a")
    mkTable(spark, "spjy", "ev_b")
    val n = spark.table("spjy.db.ev_a")
      .join(spark.table("spjy.db.ev_b"), "day").count()
    assert(n == expectedRows(spark))
  }
}
