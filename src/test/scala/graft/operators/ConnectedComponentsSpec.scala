package graft.operators

import graft.SparkFunSuite

/** Min-label propagation semantics: chains (the diameter-bound case),
  * disjoint components, and the convergence guard. */
class ConnectedComponentsSpec extends SparkFunSuite {

  private def cc(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    ConnectedComponents.labels(pairs.toDF("a", "b"), "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses to one component labeled by its minimum") {
    // 5-4-3-2-1: worst diameter per node count; min must travel the chain
    val got = cc(Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("disjoint components keep distinct minima; edge order irrelevant") {
    val got = cc(Seq((10L, 20L), (2L, 7L), (7L, 5L), (20L, 30L)))
    assert(got == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      2L -> 2L, 5L -> 2L, 7L -> 2L))
  }

  test("200-node chain converges within default maxIter (pointer-jumping)") {
    // diameter 199 ≫ maxIter 25: plain min-propagation would throw the
    // convergence guard; the label ← label(label) jump makes label paths
    // halve per round, so O(log diameter) ≈ 8-10 rounds suffice
    import spark.implicits._
    val chain = (1L until 200L).map(i => (i, i + 1)).toDF("a", "b")
    val out = ConnectedComponents.labels(chain, "a", "b").collect()
    assert(out.length == 200)
    assert(out.forall(_.getLong(1) == 1L))
  }

  test("self-loops and duplicate/reversed edges are harmless") {
    val got = cc(Seq((1L, 2L), (2L, 1L), (1L, 1L), (1L, 2L)))
    assert(got == Map(1L -> 1L, 2L -> 1L))
  }

  test("superseded rounds' checkpoint blocks are released (≤1 net persisted RDD)") {
    import spark.implicits._
    val before = spark.sparkContext.getPersistentRDDs.size
    // 9-node chain: 8+ propagation rounds, each localCheckpointing a new
    // label set — without the RDD-level unpersist this leaks one
    // persisted RDD per round (Dataset.unpersist is a no-op on
    // localCheckpoints: nothing is registered with the SQL CacheManager)
    val chain = (1L until 10L).map(i => (i, i + 1)).toDF("a", "b")
    val out = ConnectedComponents.labels(chain, "a", "b")
    assert(out.collect().forall(_.getLong(1) == 1L)) // still readable
    val after = spark.sparkContext.getPersistentRDDs.size
    assert(after - before <= 1,
      s"persisted RDDs grew by ${after - before} (checkpoint leak)")
  }

  test("maxIter guard throws on non-convergence instead of wrong labels") {
    import spark.implicits._
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    val e = intercept[IllegalArgumentException] {
      ConnectedComponents.labels(chain, "a", "b", maxIter = 2)
    }
    assert(e.getMessage.contains("converge"))
  }
}
