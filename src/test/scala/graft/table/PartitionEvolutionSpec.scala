package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Partition spec evolution ([[SnapshotTable.setPartitionSpec]]):
  * metadata-only spec changes, correct multi-generation reads, SPJ
  * degrade/re-key, and the SQL procedure surface. */
class PartitionEvolutionSpec extends SparkFunSuite {

  private def events() = graft.Tables.load(spark, sf, "events")
    .select(col("event_id"), col("user_id"), col("ts"), col("value"))

  test("evolving an unpartitioned table is metadata-only; later appends use the new spec") {
    val loc = scratch("pe-flat-to-days")
    val e = events()
    val first = e.filter(col("event_id") % 2 === 0)
    val second = e.filter(col("event_id") % 2 =!= 0)
    val t = SnapshotTable.create(spark, loc, first)
    val filesBefore = t.snapshot(t.latestVersion).files.map(_.path)

    val v = t.setPartitionSpec(Seq("days(ts)"))
    assert(t.partitionCols == Seq("days(ts)"))
    assert(t.snapshot(v).operation == "set-partition-spec")
    // metadata-only: the exact same file list, no rewrite
    assert(t.snapshot(v).files.map(_.path) == filesBefore)
    // the PREVIOUS snapshot still reports the old (empty) spec
    assert(t.snapshot(v - 1).partitionCols.isEmpty)

    t.append(second)
    // new files carry the days(ts) min==max stat; old files don't
    val snap = t.snapshot(t.latestVersion)
    val newFiles = snap.files.filterNot(f => filesBefore.contains(f.path))
    assert(newFiles.nonEmpty)
    assert(newFiles.forall(f => f.stats.get("days(ts)").exists(s => s.min == s.max)))
    assert(snap.files.filter(f => filesBefore.contains(f.path))
      .forall(f => !f.stats.contains("days(ts)")))
    // both generations read back as one exact multiset
    assert(t.read().count() == e.count())
    val expect = e.filter(to_date(col("ts")) === "2024-01-03").count()
    assert(t.read().filter(to_date(col("ts")) === "2024-01-03").count() == expect)
  }

  test("adding a bucket field: mixed generations stay exact, bucket pruning applies to new files only") {
    val loc = scratch("pe-add-bucket")
    val e = events()
    val t = SnapshotTable.create(spark, loc, e.filter(col("event_id") < 500),
      partitionCols = Seq("days(ts)"))
    t.setPartitionSpec(Seq("days(ts)", "bucket(8,user_id)"))
    t.append(e.filter(col("event_id") >= 500))
    assert(t.read().count() == e.count())
    val probe = e.filter(col("user_id") === 7).count()
    assert(t.read().filter(col("user_id") === 7).count() == probe)
    // pruning with a bucket-derived predicate keeps every old-spec file
    // (conservative) and drops provably-mismatched new-spec files
    val snap = t.snapshot(t.latestVersion)
    val derived = StatsPruning.bucketDerived(snap.partitionCols,
      t.read().schema, Seq(org.apache.spark.sql.sources.EqualTo("user_id", 7L)))
    assert(derived.nonEmpty)
    val kept = StatsPruning.prune(snap.files, derived)
    val oldGen = snap.files.filter(f => !f.stats.contains("bucket(8,user_id)"))
    assert(oldGen.nonEmpty)
    assert(oldGen.forall(f => kept.exists(_.path == f.path)),
      "old-spec files must conservatively survive bucket-derived pruning")
    assert(kept.size < snap.files.size,
      "some new-spec files must be pruned by the bucket predicate")
  }

  test("SPJ eligibility degrades across an evolution and compaction re-keys it") {
    val loc = scratch("pe-spj-rekey")
    val e = events()
    val t = SnapshotTable.create(spark, loc, e.filter(col("event_id") < 500),
      partitionCols = Seq("days(ts)"))
    t.setPartitionSpec(Seq("bucket(8,user_id)"))
    t.append(e.filter(col("event_id") >= 500))
    val snap = t.snapshot(t.latestVersion)
    // old-generation files carry no bucket stat → all-or-nothing keying
    // refuses, the scan falls back to the ordinary path
    assert(KeyGroupedScan.fileKeys(snap.files, snap.partitionCols,
      t.read().schema).isEmpty)
    t.compact(targetBytes = 64L * 1024 * 1024)
    val after = t.snapshot(t.latestVersion)
    assert(KeyGroupedScan.fileKeys(after.files, after.partitionCols,
      t.read().schema).isDefined,
      "compaction rewrites every file under the current spec — SPJ-eligible again")
    assert(t.read().count() == e.count())
  }

  test("replaceWhere stays exact across mixed partition generations") {
    val loc = scratch("pe-replacewhere")
    val e = events()
    val t = SnapshotTable.create(spark, loc, e.filter(col("event_id") < 500))
    t.setPartitionSpec(Seq("bucket(8,user_id)"))
    t.append(e.filter(col("event_id") >= 500))
    val replacement = e.filter(col("user_id") === 3)
      .withColumn("value", col("value") * 2)
    t.replaceWhere(col("user_id") === 3, replacement)
    val expect = e.withColumn("value",
      when(col("user_id") === 3, col("value") * 2).otherwise(col("value")))
    assert(t.read().count() == expect.count())
    val got = t.read().agg(sum("value")).head().getDouble(0)
    val want = expect.agg(sum("value")).head().getDouble(0)
    assert(math.abs(got - want) < 1e-6 * math.abs(want))
  }

  test("empty spec un-partitions; invalid specs are refused") {
    val loc = scratch("pe-validate")
    val t = SnapshotTable.create(spark, loc, events(),
      partitionCols = Seq("days(ts)"))
    // unknown column
    val e1 = intercept[IllegalArgumentException](
      t.setPartitionSpec(Seq("bucket(8,nope)")))
    assert(e1.getMessage.contains("unknown column"))
    // wrong source type for bucket
    val e2 = intercept[IllegalArgumentException](
      t.setPartitionSpec(Seq("bucket(8,value)")))
    assert(e2.getMessage.contains("not supported"))
    // time transform over a non-time column
    val e3 = intercept[IllegalArgumentException](
      t.setPartitionSpec(Seq("months(user_id)")))
    assert(e3.getMessage.contains("timestamp/date"))
    // duplicate fields
    val e4 = intercept[IllegalArgumentException](
      t.setPartitionSpec(Seq("days(ts)", "days(ts)")))
    assert(e4.getMessage.contains("duplicate"))
    // identical spec is a no-op (no new snapshot)
    val before = t.latestVersion
    assert(t.setPartitionSpec(Seq("days(ts)")) == before)
    assert(t.latestVersion == before)
    // empty spec un-partitions: future appends are flat
    t.setPartitionSpec(Seq.empty)
    assert(t.partitionCols.isEmpty)
    t.append(events().limit(100))
    assert(t.read().count() == events().count() + 100)
  }

  test("a concurrent commit aborts the spec change instead of clobbering") {
    val loc = scratch("pe-race")
    val t = SnapshotTable.create(spark, loc, events().limit(500))
    val v0 = t.latestVersion
    SnapshotTable.load(spark, loc).append(events().limit(10)) // table moves
    intercept[java.util.ConcurrentModificationException] {
      t.setPartitionSpec(Seq("days(ts)"), validatedAt = v0)
    }
    // validated against the CURRENT head it lands
    assert(t.setPartitionSpec(Seq("days(ts)")) == t.latestVersion)
    assert(t.partitionCols == Seq("days(ts)"))
  }

  test("native ALTER TABLE ADD/DROP/REPLACE PARTITION FIELD spellings") {
    // the Iceberg SQL-extension syntax, desugared by the extension parser
    // to the same set_partition_spec procedure — needs an extensions
    // session (the shared suite session has no GraftExtensions)
    val shared = graft.SparkSuite.spark
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-pevo-ddl")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    org.apache.spark.sql.SparkSession.setDefaultSession(shared)
    org.apache.spark.sql.SparkSession.setActiveSession(s)
    try {
      val wh = graft.Tables.scratch("test/pe-ddl-wh")
      graft.Tables.deleteRecursively(wh)
      s.conf.set("spark.sql.catalog.pddl", classOf[GraftCatalog].getName)
      s.conf.set("spark.sql.catalog.pddl.warehouse", wh)
      s.sql(
        """CREATE TABLE pddl.db.ev (event_id BIGINT, user_id BIGINT,
          |  ts TIMESTAMP, value DOUBLE)""".stripMargin)
      val t = SnapshotTable.load(s, s"$wh/db/ev")
      s.sql("ALTER TABLE pddl.db.ev ADD PARTITION FIELD days(ts)")
      assert(t.partitionCols == Seq("days(ts)"))
      s.sql("ALTER TABLE pddl.db.ev ADD PARTITION FIELD bucket(8, user_id)")
      assert(t.partitionCols == Seq("days(ts)", "bucket(8,user_id)"))
      s.sql("ALTER TABLE pddl.db.ev REPLACE PARTITION FIELD days(ts) WITH months(ts)")
      assert(t.partitionCols == Seq("bucket(8,user_id)", "months(ts)"))
      s.sql("ALTER TABLE pddl.db.ev DROP PARTITION FIELD bucket(8,user_id)")
      assert(t.partitionCols == Seq("months(ts)"))
      // dropping a field that isn't in the spec refuses loudly
      val ex = intercept[Exception](
        s.sql("ALTER TABLE pddl.db.ev DROP PARTITION FIELD days(ts)"))
      assert(ex.getMessage.contains("not in the current spec"))
      // non-graft identifiers pass through to stock Spark untouched
      // (which refuses the Iceberg-only syntax with its own parse error)
      intercept[Exception](
        s.sql("ALTER TABLE spark_catalog.default.nope ADD PARTITION FIELD days(ts)"))
      assert(t.partitionCols == Seq("months(ts)"))
    } finally {
      org.apache.spark.sql.SparkSession.setActiveSession(shared)
      org.apache.spark.sql.SparkSession.setDefaultSession(shared)
    }
  }

  test("SQL procedure: CALL set_partition_spec evolves a catalog table") {
    val wh = graft.Tables.scratch("test/pe-proc-wh")
    graft.Tables.deleteRecursively(wh)
    spark.conf.set("spark.sql.catalog.pevo", classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.pevo.warehouse", wh)
    spark.sql(
      """CREATE TABLE pevo.db.ev (event_id BIGINT, user_id BIGINT,
        |  ts TIMESTAMP, value DOUBLE)""".stripMargin)
    events().limit(1000).writeTo("pevo.db.ev").append()
    val row = spark.sql(
      "CALL pevo.system.set_partition_spec(table => 'db.ev', " +
        "spec => 'days(ts), bucket(4, user_id)')").head()
    assert(row.getString(1) == "days(ts), bucket(4,user_id)")
    events().limit(1000).writeTo("pevo.db.ev").append()
    assert(spark.table("pevo.db.ev").count() == 2000)
    val t = SnapshotTable.load(spark, s"$wh/db/ev")
    assert(t.partitionCols == Seq("days(ts)", "bucket(4,user_id)"))
  }
}
