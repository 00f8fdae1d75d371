package graft.metrics

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Per-query execution metrics captured through Spark's
  * `QueryExecutionListener` — the engine-side mirror of the reference's
  * `snowflake.account_usage.query_history` columns (elapsed time, bytes
  * scanned, shuffle volume, status; reference
  * `performance_comparison.sql:179-193`, `run_performance_tests.py:83-123`).
  *
  * Values come from the executed plan's SQLMetrics: bytes scanned from the
  * leaf scans' `filesSize`/`bytesRead`, rows scanned from the leaves'
  * `numOutputRows`, shuffle volume from each `ShuffleExchangeExec`'s
  * `dataSize`. Capture is pure metadata observation — it adds nothing to
  * the query's own work, so it is safe to leave on in production the way
  * the reference's always-on query_history is.
  */
object QueryMetrics {

  case class Rec(query_name: String, query_type: String, duration_ms: Double,
      rows_scanned: Long, bytes_scanned: Long, shuffle_bytes: Long,
      status: String)

  private final class Listener extends QueryExecutionListener {
    val recs = ArrayBuffer[Rec]()
    @volatile var current: (String, String) = ("unnamed", "other")

    private def record(qe: QueryExecution, durationNs: Long, status: String): Unit = {
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
      // AQE hides the real operators behind AdaptiveSparkPlanExec and
      // leaf-like QueryStageExec wrappers; walk through them explicitly
      def walk(p: SparkPlan): Seq[SparkPlan] = {
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
      recs.synchronized {
        recs += Rec(current._1, current._2, durationNs / 1e6,
          metricSum(isScan, "numOutputRows"),
          metricSum(isScan, "filesSize", "bytesRead"),
          metricSum(_.isInstanceOf[ShuffleExchangeLike], "dataSize"),
          status)
      }
    }

    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      record(qe, durationNs, "SUCCESS")
    override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
      record(qe, 0L, "ERROR")

    def countFor(name: String): Int =
      recs.synchronized(recs.count(_.query_name == name))
  }

  /** Run each `(name, type, build)` probe to completion under a metrics
    * listener and return the captured history as a DataFrame. The listener
    * bus is asynchronous, so after each probe we wait for its record to
    * land before re-labelling the listener for the next one. */
  def capture(spark: SparkSession,
      probes: Seq[(String, String, () => DataFrame)]): DataFrame = {
    import spark.implicits._
    val l = new Listener
    spark.listenerManager.register(l)
    try {
      probes.foreach { case (name, typ, build) =>
        l.current = (name, typ)
        build().collect()
        val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
        while (l.countFor(name) == 0 && System.nanoTime() < deadline)
          Thread.sleep(10)
        require(l.countFor(name) > 0, s"no metrics event captured for $name")
      }
    } finally spark.listenerManager.unregister(l)
    l.recs.synchronized(l.recs.toList).toDF()
  }
}
