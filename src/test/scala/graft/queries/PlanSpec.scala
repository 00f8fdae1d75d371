package graft.queries

import graft.SparkFunSuite

/** Plan guard over the whole query registry: no query may plan an
  * unbounded CartesianProduct, and only the explicitly-approved
  * brute-force similarity queries may use a nested-loop join (their small
  * side is broadcastable by design). Catches the 100 TB killers at test
  * time — an accidental cross join passes every correctness check and
  * then melts a real cluster.
  */
class PlanSpec extends SparkFunSuite {

  // brute-force scorers: nested-loop with a broadcast side is the intended
  // plan (q37/q39 small-side broadcast; q50's centroid probe is 16 rows;
  // q38/q50 embed the exact q37 baseline for their recall summaries);
  // q94's broadcast side is the ONE-row corpus-stats aggregate (N, avgdl,
  // per-term df) every scored row needs — a scalar-broadcast join, not a
  // pairwise product
  private val nestedLoopAllowed = Set(
    "q37_ann_topk", "q38_ann_lsh", "q39_embedding_neardup", "q50_ann_ivf",
    "q94_bm25_search")

  test("no query plans a cartesian product; nested-loop only where approved") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // planning only — skip the streaming entry, which executes on build
      if (name != "q42_streaming_agg") {
        val plan =
          try fn(spark, sf).queryExecution.executedPlan.toString
          catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
        if (plan.contains("CartesianProduct"))
          offenders += s"$name: CartesianProduct"
        if (plan.contains("BroadcastNestedLoopJoin") && !nestedLoopAllowed(name))
          offenders += s"$name: BroadcastNestedLoopJoin"
      }
    }
    assert(offenders.isEmpty, s"plan violations:\n${offenders.mkString("\n")}")
  }
}
