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
  // plan (q37 small-side broadcast; q50's centroid probe is 16 rows;
  // q38/q50 embed the exact q37 baseline for their recall summaries);
  // q94's broadcast side is the ONE-row corpus-stats aggregate (N, avgdl,
  // per-term df) every scored row needs — a scalar-broadcast join, not a
  // pairwise product. q39 is NOT on this list: its exact all-pairs join
  // is a block-replicated equi-join (EmbeddingJoin) with no nested loop.
  // q50b shares q50's centroid-probe shape (queries × ≤1024 broadcast
  // centroids) and embeds the exact baseline for its recall summary
  private val nestedLoopAllowed = Set(
    "q37_ann_topk", "q38_ann_lsh", "q50_ann_ivf", "q50b_ann_ivfpq",
    "q94_bm25_search")

  test("no query plans a cartesian product; nested-loop only where approved") {
    val offenders = scala.collection.mutable.ListBuffer[String]()
    // planning only — skip entries whose BUILDERS execute a streaming
    // drain (q42, q88): the returned plan is just the destination-table
    // readback, so running the whole stream buys no plan coverage here
    // (the streaming plans themselves are exercised by StreamsSpec/q88's
    // oracle row, not by this guard)
    val streamOnBuild = Set("q42_streaming_agg", "q88_stream_stream_join")
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (!streamOnBuild(name)) {
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
