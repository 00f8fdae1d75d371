package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided test tables (TESTDATA.md / FIXTURES.md §B).
  *
  * Mapping to the reference data model (see SURVEY.md §1 and
  * reference `demo-setup/data-generation/generate_sample_data.py:29-54`):
  * `events` plays the `user_events` fact table, `customer` plays the
  * `user_profiles` dimension (`c_custkey` → `user_id`, `c_mktsegment` →
  * `region`). The TPC-H-ish tables exercise join/agg operators at scale.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every test table as a temp view named as in TESTDATA.md. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))

  /** Fixed "today" anchor for the reference's relative-date predicates
    * (`CURRENT_DATE - n`, reference `performance_comparison.sql:73,99,153`).
    * The driver events table spans 2024-01-01 .. 2024-01-30, so we pin
    * now = 2024-01-31 to keep every query deterministic across runs and
    * identical between Spark and the DuckDB oracle.
    */
  val Anchor = "2024-01-31 00:00:00"

  /** `CURRENT_DATE - n` under the pinned anchor, as a timestamp literal. */
  def daysAgo(n: Int): String = {
    val d = java.time.LocalDate.parse(Anchor.take(10)).minusDays(n.toLong)
    s"$d 00:00:00"
  }
}
