package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproduces the reference's two on-disk layouts from the driver events
  * table (reference `generate_sample_data.py:83-138`):
  *
  *  - small-files (streaming) layout:
  *    `year=Y/month=M/day=D/hour=H/minute=m/…parquet`, one file per 10-min
  *    bucket — the small-file problem the compaction story is about;
  *  - large-files (batch) layout: `year=Y/month=M/day=D/…parquet`, a few
  *    batch files per day.
  *
  * Both are Hive-partitioned so Spark's partition discovery prunes on the
  * date-component columns — the observable behavior Q9 and the
  * degradation demo depend on. The writers are plain distributed
  * `partitionBy` writes: at 100 TB each partition directory is written by
  * the executors that own its rows, no driver fan-out.
  */
object FixtureGen {

  /** Streaming layout: 144 10-minute buckets per day, one file each. */
  def smallFiles(spark: SparkSession, events: DataFrame, outDir: String,
      days: Int = 7): String = {
    val upper = to_date(lit(graft.Tables.Anchor.take(10)))
    val windowed = events
      .filter(to_date(col("ts")) >= date_sub(upper, days) && to_date(col("ts")) < upper)
    withDateParts(windowed)
      .withColumn("hour", hour(col("ts")))
      .withColumn("minute", (floor(minute(col("ts")) / 10) * 10).cast("int"))
      .repartition(col("year"), col("month"), col("day"), col("hour"), col("minute"))
      .write.mode("overwrite")
      .partitionBy("year", "month", "day", "hour", "minute")
      .parquet(outDir)
    outDir
  }

  /** Batch layout: `filesPerDay` parquet files per day directory. */
  def largeFiles(spark: SparkSession, events: DataFrame, outDir: String,
      filesPerDay: Int = 4): String = {
    withDateParts(events)
      .withColumn("batch", pmod(hash(col("event_id")), lit(filesPerDay)))
      .repartition(col("year"), col("month"), col("day"), col("batch"))
      .drop("batch")
      .write.mode("overwrite")
      .partitionBy("year", "month", "day")
      .parquet(outDir)
    outDir
  }

  private def withDateParts(df: DataFrame): DataFrame =
    df.withColumn("year", year(col("ts")))
      .withColumn("month", month(col("ts")))
      .withColumn("day", dayofmonth(col("ts")))
}
