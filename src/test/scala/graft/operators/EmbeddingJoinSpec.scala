package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** The block-replicated exact threshold join must be EXACTLY the brute
  * force product — same pairs, same rounded sims — and must plan as an
  * equi-join (no nested loop), for any block count.
  */
class EmbeddingJoinSpec extends SparkFunSuite {

  private def emb = {
    graft.functions.Registry.install(spark)
    graft.Tables.load(spark, sf, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
  }

  private def brute(tau: Double) = {
    val e = emb
    val a = e.select(col("vec_id").as("vec_a"), col("v").as("qv"))
    val b = e.select(col("vec_id").as("vec_b"), col("v").as("nv"))
    a.join(b, col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(expr("cosine_sim(qv, nv)"), 4))
      .filter(col("cos_sim") >= tau)
      .select("vec_a", "vec_b", "cos_sim")
      .orderBy("vec_a", "vec_b").collect().toSeq
  }

  test("exactPairs == brute force on driver fixtures (default blocks)") {
    val got = EmbeddingJoin.exactPairs(emb, "vec_id", "v", 0.45)
      .orderBy("vec_a", "vec_b").collect().toSeq
    val want = brute(0.45)
    assert(want.nonEmpty, "fixture should contain qualifying pairs")
    assert(got == want)
  }

  test("exactPairs == brute force with awkward block counts") {
    // 1 block (degenerate: single join key) and a prime count larger than
    // the row count (most blocks empty) both still meet every pair once
    val want = brute(0.45)
    for (b <- Seq(1, 7, 997)) {
      val got = EmbeddingJoin.exactPairs(emb, "vec_id", "v", 0.45, blocks = b)
        .orderBy("vec_a", "vec_b").collect().toSeq
      assert(got == want, s"blocks=$b diverged from brute force")
    }
  }

  test("plan is an equi-join: no nested loop, no cartesian") {
    val plan = EmbeddingJoin.exactPairs(emb, "vec_id", "v", 0.45)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.linesIterator.take(20).mkString("\n"))
    assert(!plan.contains("CartesianProduct"))
  }

  test("blockCount: floor, cap, and ~N/4096 sizing") {
    assert(EmbeddingJoin.blockCount(0) == 1)
    assert(EmbeddingJoin.blockCount(2000) == 31)       // small-N floor: N/64 (r21)
    assert(EmbeddingJoin.blockCount(16384) == 32)      // full floor from 2048 up
    assert(EmbeddingJoin.blockCount(1000000) == 245)   // ceil(1e6/4096)
    assert(EmbeddingJoin.blockCount(100000000L) == 4096) // capped
  }

  test("the block join is pinned to b partitions (AQE can't coalesce it away)") {
    // r21: AQE's size-based coalescing folded the byte-tiny but
    // compute-quadratic block join into ONE task; exactPairs now pins one
    // task per block with an explicit repartition, which must survive
    // into the executed plan as REPARTITION_BY_NUM
    val plan = EmbeddingJoin.exactPairs(emb, "vec_id", "v", 0.45)
      .queryExecution.executedPlan.toString
    assert(plan.contains("REPARTITION_BY_NUM"), plan.linesIterator.take(30).mkString("\n"))
  }
}
