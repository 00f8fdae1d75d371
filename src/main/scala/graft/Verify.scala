package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Output-dtype guard (r20 verdict task 3): the driver hashes dtypes, and
    * no oracle query deliberately produces a decimal — Spark decimal128
    * against DuckDB float64 is exactly how q130 went hash-red in r20 while
    * values agreed. Refuse to ship such a schema (the query records as
    * failed) rather than find out in CORRECTNESS. */
  def assertNoDecimal(name: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    val bad = schema.fields.filter(
      _.dataType.isInstanceOf[org.apache.spark.sql.types.DecimalType])
    require(bad.isEmpty,
      s"$name emits DecimalType column(s) ${bad.map(_.name).mkString(",")} — " +
        "the DuckDB oracle yields float64; cast to double (r20 q130 bug class)")
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.sql.warehouse.dir", Tables.scratch("warehouse"))
      .config("spark.ui.enabled", "false")
      // same planning/committer settings as Bench (see the rationale
      // there): correctness is verified under the exact confs the bench
      // times, so an optimization can never pass here and diverge there
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.sources.parallelPartitionDiscovery.threshold", "512")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.hadoopConfiguration
      .set("mapreduce.fileoutputcommitter.algorithm.version", "2")
    new java.io.File(outDir).mkdirs()
    // Local-iteration filter (driver always runs the full set): a
    // comma-separated allowlist of query names. The oracle dump below is
    // filtered to the SAME set — otherwise compare.py would "validate"
    // the skipped queries against whatever stale parquet a previous run
    // left in outDir and report them green without running them.
    // a BLANK value means unset (an empty allowlist would select zero
    // queries, dump an empty oracle file, and let compare.py report a
    // fully-green 0/0 round — the exact silent-green hazard the filtered
    // dump exists to prevent)
    val only = sys.env.get("SPARK_GRAFT_ONLY").filter(_.trim.nonEmpty)
      .map(_.split(",").toSet)
    val selected = SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // The reference's timestamps are NTZ (Snowflake TIMESTAMP_NTZ,
        // SURVEY §1.2); the session is pinned to UTC, so casting the
        // instant-typed outputs to NTZ preserves the wall-clock value and
        // makes the parquet dump match the DuckDB oracle's naive type.
        import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
        import org.apache.spark.sql.functions.col
        val ntz = df.select(df.schema.fields.map { f =>
          if (f.dataType == TimestampType) col(f.name).cast(TimestampNTZType).as(f.name)
          else col(f.name)
        }.toSeq: _*)
        assertNoDecimal(name, ntz.schema)
        ntz.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
        spark.sqlContext.clearCache() // don't accumulate operator caches across queries
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => selected.contains(k) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
