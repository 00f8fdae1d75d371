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
    Seq("q38_ann_lsh", "q50_ann_ivf", "q50b_ann_ivfpq").foreach { name =>
      val row = Llm.queries(name)(spark, sf).head()
      assert(row.getAs[Long]("k") == 5L, s"$name k")
      assert(row.getAs[Long]("n_queries") == 10L, s"$name n_queries")
      assert(row.getAs[Boolean]("recall_ok"), s"$name recall below floor")
    }
  }

  test("PQ codes are M bytes; reconstruction preserves cosine ranking well enough for recall") {
    import graft.functions.Pq
    import org.apache.spark.sql.functions._
    graft.functions.Registry.install(spark)
    val e = graft.Tables.load(spark, sf, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
    val sample = e.select(col("v")).limit(4096).collect()
      .map(_.getSeq[Double](0).toArray)
    val cb = Pq.trainPq(sample, m = 8, ksub = 256, iters = 3)
    val b64 = Pq.encodeCodebook(cb)
    // codebook round-trips byte-exactly
    assert(Pq.encodeCodebook(Pq.decodeCodebook(b64)) == b64)
    val coded = e.select(col("vec_id"), col("v"),
      call_function("pq_encode", col("v"), lit(b64)).as("codes"))
    // M-byte payload: a 64-dim float vector compresses 8 bytes/row — the
    // index-size claim
    assert(coded.select(length(col("codes"))).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
    // reconstruction is close in cosine: every vector's similarity to its
    // own reconstruction beats 0.8 (the trained-codebook quality bar the
    // recall floor rests on)
    val selfSim = coded.withColumn("recon",
        call_function("pq_decode", col("codes"), lit(b64)))
      .withColumn("sim", call_function("cosine_sim", col("v"), col("recon")))
      .agg(min(col("sim"))).head().getDouble(0)
    assert(selfSim > 0.8, s"worst self-reconstruction cosine $selfSim")
    // determinism: same sample → same codes
    val cb2 = Pq.trainPq(sample, m = 8, ksub = 256, iters = 3)
    assert(Pq.encodeCodebook(cb2) == b64)
  }
}
