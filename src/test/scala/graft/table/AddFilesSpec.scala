package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** add_files (in-place migration) invariants: adopted content equals the
  * source, the source directory survives untouched, stats are harvested
  * (adopted files prune), and the two refusal contracts fire loudly. */
class AddFilesSpec extends SparkFunSuite {

  private def rawDir(name: String, n: Int = 500): String = {
    val raw = scratch(s"addfiles/$name")
    graft.Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
      .limit(n).repartition(3)
      .write.parquet(raw)
    raw
  }

  private def emptyTable(name: String): SnapshotTable =
    SnapshotTable.createEmpty(spark, scratch(s"addfiles/tab_$name"),
      graft.Tables.load(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "value").schema)

  test("adopted files read back exactly; source dir intact; stats harvested") {
    val raw = rawDir("a")
    val t = emptyTable("a")
    t.addFiles(raw)
    val want = spark.read.parquet(raw)
    assert(t.read().count() == want.count())
    assert(t.read().agg(sum("event_id")).head.getLong(0) ==
      want.agg(sum("event_id")).head.getLong(0))
    // source untouched (hard links, not moves)
    assert(Files.walk(Paths.get(raw)).iterator().asScala
      .count(_.toString.endsWith(".parquet")) == 3)
    // footer stats really harvested: rows known, min/max present
    val snap = t.snapshot(t.latestVersion)
    assert(snap.operation == "add_files")
    assert(snap.files.forall(_.rows > 0))
    assert(snap.files.forall(_.stats.contains("event_id")))
  }

  test("migrated table keeps living: normal appends coexist with adopted files") {
    val t = emptyTable("b")
    t.addFiles(rawDir("b", 300))
    import spark.implicits._
    t.append(Seq((9999901L, 1L, "extra", 1.0))
      .toDF("event_id", "user_id", "event_type", "value"))
    assert(t.read().count() == 301)
  }

  test("hidden/temp committer debris under the source dir is NOT adopted") {
    val raw = rawDir("e", 200)
    // a crashed committer's leftover: same rows again under _temporary
    val tmp = Paths.get(raw, "_temporary", "0")
    Files.createDirectories(tmp)
    graft.Tables.load(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value").limit(200)
      .coalesce(1).write.parquet(tmp.resolve("attempt_1").toString)
    val t = emptyTable("e")
    t.addFiles(raw)
    assert(t.read().count() == 200) // not 400 — debris skipped like Spark does
  }

  test("adopted commits are append-family: incremental reads cross them") {
    val t = emptyTable("f")
    t.addFiles(rawDir("f", 150))
    val v1 = t.latestVersion
    import spark.implicits._
    t.append(Seq((9999904L, 1L, "extra", 1.0))
      .toDF("event_id", "user_id", "event_type", "value"))
    // from-the-beginning delta crosses the add_files commit…
    assert(t.appendsSince(-1).count() == 151)
    // …and the post-migration delta is exactly the appended row
    assert(t.appendsSince(v1).count() == 1)
  }

  test("re-running add_files over the same source dir refuses; counts unchanged") {
    val raw = rawDir("g", 120)
    val t = emptyTable("g")
    t.addFiles(raw)
    val v1 = t.latestVersion
    assert(t.read().count() == 120)
    // Iceberg check_duplicate_files parity: the second run would re-link
    // the same inodes and silently double every row count
    val e = intercept[IllegalArgumentException] { t.addFiles(raw) }
    assert(e.getMessage.contains("already adopted"), e.getMessage)
    assert(t.latestVersion == v1) // no commit landed
    assert(t.read().count() == 120)
    // a PARTIAL overlap refuses too: one old file inside a new dir
    val raw2 = scratch("addfiles/g_mixed")
    Files.createDirectories(Paths.get(raw2))
    val oldOne = Files.walk(Paths.get(raw)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).toSeq.head
    Files.createLink(Paths.get(raw2, "old.parquet"), oldOne)
    val e2 = intercept[IllegalArgumentException] { t.addFiles(raw2) }
    assert(e2.getMessage.contains("already adopted"), e2.getMessage)
    // genuinely-new files under a different dir still adopt fine
    val raw3 = rawDir("g_new", 30)
    t.addFiles(raw3)
    assert(t.read().count() == 150)
  }

  test("check_duplicate_files => false permits a deliberate re-adoption") {
    val raw = rawDir("h", 80)
    val t = emptyTable("h")
    t.addFiles(raw)
    assert(t.read().count() == 80)
    // default refuses (guarded path unchanged by the knob's existence)
    intercept[IllegalArgumentException] { t.addFiles(raw) }
    // explicit opt-out re-adopts: rows double, which is now the CALLER's
    // stated intent (Iceberg's check_duplicate_files => false semantics)
    t.addFiles(raw, checkDuplicateFiles = false)
    assert(t.read().count() == 160)
    // the procedure surface carries the same knob
    val wh = scratch("addfiles/wh_h")
    spark.conf.set("spark.sql.catalog.afknob",
      classOf[GraftCatalog].getName)
    spark.conf.set("spark.sql.catalog.afknob.warehouse", wh)
    spark.sql("CREATE TABLE afknob.db.mig (event_id BIGINT, user_id BIGINT, " +
      "event_type STRING, value DOUBLE)")
    spark.sql(s"CALL afknob.system.add_files(table => 'db.mig', source_dir => '$raw')")
    val again = intercept[Exception] {
      spark.sql(s"CALL afknob.system.add_files(table => 'db.mig', source_dir => '$raw')")
    }
    assert(again.getMessage.contains("already adopted"), again.getMessage)
    val r = spark.sql(s"CALL afknob.system.add_files(table => 'db.mig', " +
      s"source_dir => '$raw', check_duplicate_files => false)").collect()
    assert(r.head.getLong(1) == 80)
    assert(spark.sql("SELECT count(*) FROM afknob.db.mig").head.getLong(0) == 160)
  }

  test("schema mismatch refuses loudly at the declared column") {
    val raw = scratch("addfiles/c_raw")
    graft.Tables.load(spark, sf, "events")
      .select(col("event_id"), col("value").cast("string").as("value"))
      .limit(10).write.parquet(raw)
    val t = emptyTable("c")
    val e = intercept[IllegalArgumentException] { t.addFiles(raw) }
    // names the first declared column the file fails to store
    assert(e.getMessage.contains("add_files: declared column"), e.getMessage)
  }

  test("partitioned tables refuse adoption (no partition keys to carry)") {
    val loc = scratch("addfiles/tab_d")
    val t = SnapshotTable.create(spark, loc,
      graft.Tables.load(spark, sf, "events")
        .select("event_id", "user_id", "event_type", "value").limit(50),
      partitionCols = Seq("event_type"))
    val e = intercept[IllegalArgumentException] {
      t.addFiles(rawDir("d", 50))
    }
    assert(e.getMessage.contains("partitioned"), e.getMessage)
  }
}
