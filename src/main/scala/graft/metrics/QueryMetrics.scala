package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-query execution metrics — the engine-side mirror of the
  * reference's `snowflake.account_usage.query_history` columns (elapsed
  * time, bytes scanned, shuffle volume, status; reference
  * `performance_comparison.sql:179-193`, `run_performance_tests.py:83-123`).
  *
  * Values come straight from each probe's OWN executed plan's SQLMetrics
  * after it completes: bytes scanned from the leaf scans'
  * `filesSize`/`bytesRead`, rows scanned from the leaves'
  * `numOutputRows`, shuffle volume from each shuffle exchange's
  * `dataSize`. Reading the execution synchronously (instead of a
  * `QueryExecutionListener`) pins each record to exactly its query — the
  * async listener bus can interleave straggler events from earlier
  * queries under the wrong label. Capture is pure metadata observation;
  * it adds nothing to the query's own work.
  */
object QueryMetrics {

  case class Rec(query_name: String, query_type: String, duration_ms: Double,
      rows_scanned: Long, bytes_scanned: Long, shuffle_bytes: Long,
      status: String)

  /** (rows scanned, bytes scanned, shuffle bytes) off an executed plan's
    * SQLMetrics. Public: [[graft.Bench]] records these per query so bench
    * drift is attributable — a real plan regression moves bytes, JVM/GC
    * drift does not (round-13 scan-family attribution, README). */
  def planMetrics(qe: org.apache.spark.sql.execution.QueryExecution)
      : (Long, Long, Long) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
    // AQE hides the real operators behind AdaptiveSparkPlanExec and
    // leaf-like QueryStageExec wrappers; walk through them explicitly.
    // A reused exchange points back at an already-counted subtree — its
    // scans/shuffles did the work ONCE — so each physical node is summed
    // at most once (identity-tracked, since case-class equality would
    // conflate genuinely distinct but equal-shaped nodes).
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      if (!seen.add(p)) return Seq.empty
      val inner = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case s: QueryStageExec => Seq(s.plan)
        case r: ReusedExchangeExec => Seq(r.child)
        case other => other.children
      }
      p +: inner.flatMap(walk)
    }
    val nodes = walk(qe.executedPlan)
    def metricSum(sel: SparkPlan => Boolean, names: String*): Long =
      nodes.filter(sel).map { n =>
        names.flatMap(nm => n.metrics.get(nm).map(_.value)).sum
      }.sum
    val isScan: SparkPlan => Boolean = n =>
      n.isInstanceOf[org.apache.spark.sql.execution.FileSourceScanExec] ||
        n.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]
    (metricSum(isScan, "numOutputRows"),
      metricSum(isScan, "filesSize", "bytesRead"),
      metricSum(_.isInstanceOf[ShuffleExchangeLike], "dataSize"))
  }

  /** Run each `(name, type, build)` probe to completion and return the
    * captured history as a DataFrame. */
  def capture(spark: SparkSession,
      probes: Seq[(String, String, () => DataFrame)]): DataFrame = {
    import spark.implicits._
    probes.map { case (name, typ, build) =>
      val df = build()
      val t0 = System.nanoTime()
      val status =
        try { df.collect(); "SUCCESS" }
        catch { case _: Throwable => "ERROR" }
      val durMs = (System.nanoTime() - t0) / 1e6
      val (rows, bytes, shuffle) = planMetrics(df.queryExecution)
      Rec(name, typ, durMs, rows, bytes, shuffle, status)
    }.toDF()
  }
}
