package graft.queries

import graft.SparkFunSuite

/** Quantified quality for the approximate ANN paths: q38 (LSH buckets)
  * and q50 (IVF cells) have no value oracle by design, so this spec pins
  * their recall@5 against the exact brute-force baseline (q37) — the
  * check that keeps "approximate" from silently degrading to "random". */
class AnnRecallSpec extends SparkFunSuite {

  private def pairs(name: String): Set[(Long, Long)] =
    Llm.queries(name)(spark, sf)
      .select("query_id", "neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("LSH and IVF ANN recall@5 against the exact baseline") {
    val exact = pairs("q37_ann_topk")
    assert(exact.size == 50) // 10 queries × top-5

    val lsh = pairs("q38_ann_lsh")
    val ivf = pairs("q50_ann_ivf")
    val lshRecall = exact.intersect(lsh).size.toDouble / exact.size
    val ivfRecall = exact.intersect(ivf).size.toDouble / exact.size

    // deterministic (seeded hyperplanes / seeded k-means, fixed data):
    // thresholds are floors well under observed values, so they catch
    // structural regressions without flaking on parameter nudges
    assert(lshRecall >= 0.3, f"LSH recall@5 degraded: $lshRecall%.2f")
    assert(ivfRecall >= 0.4, f"IVF recall@5 degraded: $ivfRecall%.2f")
  }
}
