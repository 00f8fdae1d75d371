package graft.queries

import graft.SparkFunSuite

/** Quantified quality for the approximate ANN paths: q38 (LSH buckets)
  * and q50 (IVF cells) have no value oracle by design, so this spec pins
  * their recall@5 against the exact brute-force baseline (q37) — the
  * check that keeps "approximate" from silently degrading to "random". */
class AnnRecallSpec extends SparkFunSuite {

  private def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet

  test("LSH and IVF ANN recall@5 against the exact baseline") {
    val exact = pairs(Llm.queries("q37_ann_topk")(spark, sf))
    assert(exact.size == 50) // 10 queries × top-5

    val lsh = pairs(Llm.lshTopK(spark, sf))
    val ivf = pairs(Llm.ivfTopK(spark, sf))
    val lshRecall = exact.intersect(lsh).size.toDouble / exact.size
    val ivfRecall = exact.intersect(ivf).size.toDouble / exact.size

    // deterministic (seeded hyperplanes / seeded k-means, fixed data):
    // thresholds are floors well under observed values, so they catch
    // structural regressions without flaking on parameter nudges
    assert(lshRecall >= 0.3, f"LSH recall@5 degraded: $lshRecall%.2f")
    assert(ivfRecall >= 0.4, f"IVF recall@5 degraded: $ivfRecall%.2f")
  }

  test("IVF cell policy: clamp(16, ceil(sqrt(N)), 1024), never above N") {
    assert(Llm.ivfCells(0) == 1) // degenerate corpus still trains
    assert(Llm.ivfCells(10) == 10) // cells can never exceed the corpus
    assert(Llm.ivfCells(50) == 16) // floor
    assert(Llm.ivfCells(500) == 23) // ceil(sqrt(500))
    assert(Llm.ivfCells(5000) == 71)
    assert(Llm.ivfCells(500000) == 708)
    assert(Llm.ivfCells(10000000) == 1024) // budget cap
  }

  test("q38/q50 driver rows report the same recall contract (recall_ok = true)") {
    Seq("q38_ann_lsh", "q50_ann_ivf").foreach { name =>
      val row = Llm.queries(name)(spark, sf).head()
      assert(row.getAs[Long]("k") == 5L, s"$name k")
      assert(row.getAs[Long]("n_queries") == 10L, s"$name n_queries")
      assert(row.getAs[Boolean]("recall_ok"), s"$name recall below floor")
    }
  }
}
