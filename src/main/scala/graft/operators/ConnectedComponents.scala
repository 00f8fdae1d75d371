package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list by iterative min-label
  * propagation — the cluster-resolution step after near-dup pair
  * generation: pairs say "these two docs duplicate each other", components
  * say "this is the dedup GROUP, keep one representative".
  *
  * Each round every node takes the minimum label among itself and its
  * neighbors, then POINTER-JUMPS: `label ← label(label)` (Shiloach–Vishkin
  * shortcutting, one self-join on the label set). Propagation alone needs
  * O(component diameter) rounds — a 100-node chain would blow the
  * `maxIter` guard; with the jump the label paths halve each round and
  * chains converge in O(log diameter). Labels only ever decrease and are
  * always ids of nodes inside the same component, so the fixpoint is
  * unchanged: every node carries its component's minimum node id
  * (deterministic — no tie-breaking needed). Near-dup graphs are unions
  * of small dense clusters (2-3 rounds regardless), so the jump is
  * insurance for the pathological chain shape and engages ADAPTIVELY,
  * only after `jumpAfter` plain rounds haven't converged — the common
  * case pays nothing, long paths still finish in O(log diameter).
  * `localCheckpoint` cuts the growing lineage each round so the plan
  * doesn't re-execute prior iterations.
  */
object ConnectedComponents {

  /** Labels every node appearing in `pairs` with its component's minimum
    * node id. Output: (node, component) — one row per distinct node.
    * Throws if the propagation hasn't converged after `maxIter` rounds
    * (a silent non-fixpoint would return WRONG labels, not approximate
    * ones).
    */
  /** The RDD a localCheckpointed Dataset persisted: `Dataset.unpersist`
    * only uncaches SQL CacheManager entries, which a localCheckpoint
    * never registers — the blocks live on the checkpointed RDD inside the
    * plan's LogicalRDD leaf, and releasing them means unpersisting THAT.
    */
  private def checkpointedRdd(df: DataFrame) =
    df.queryExecution.logical.collectFirst {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
    }

  /** Diagnostic hook: called after each round with (round index, elapsed
    * seconds, whether the pointer-jump join ran, converged) — the bench
    * attribution instrument behind the README's q83 round-cost table.
    * Default is a no-op; the hot loop shape is unchanged.
    */
  type RoundProbe = (Int, Double, Boolean, Boolean) => Unit

  def labels(pairs: DataFrame, a: String, b: String, maxIter: Int = 25,
      jumpAfter: Int = 3,
      onRound: RoundProbe = (_, _, _, _) => ()): DataFrame = {
    val edges = pairs.select(col(a).as("s"), col(b).as("d"))
      .union(pairs.select(col(b).as("s"), col(a).as("d")))
      .distinct()
      .localCheckpoint()
    // init FUSED with the first propagation round (r21): the round-0
    // label of a node is always min(self, min neighbor), so seed it in
    // the same aggregation that would otherwise be round 1's join — one
    // groupBy over the edge list instead of a distinct + a full
    // join-propagation round. Fixpoint unchanged (labels still only ever
    // decrease within the component); dense near-dup clusters now
    // converge one round earlier.
    var labels = edges.groupBy(col("s").as("node"))
      .agg(min(col("d")).as("nbr"))
      .select(col("node"), least(col("node"), col("nbr")).as("component"))
      .localCheckpoint()
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val roundT0 = System.nanoTime()
      // each node's best neighbor label this round
      val viaNbr = edges
        .join(labels.withColumnRenamed("node", "d")
          .withColumnRenamed("component", "nbr"), "d")
        .groupBy(col("s").as("node"))
        .agg(min("nbr").as("nbr"))
      // carry the pre-update label as `old` through the checkpoint: the
      // convergence signal then comes from a cheap filter over the
      // checkpointed result instead of a second full join per round
      val prop = labels.join(viaNbr, Seq("node"), "left")
        .select(col("node"), col("component").as("old"),
          least(col("component"), coalesce(col("nbr"), col("component")))
            .as("component"))
      // pointer-jump: component ← label(component). Every label is the id
      // of a node in the same component (self at init, a neighbor's label
      // after), so the lookup side is total; left+coalesce only guards
      // plan-level nulls. Halves the label-path length every round —
      // chains converge in O(log diameter) instead of tripping maxIter.
      // ADAPTIVE: engaged only once plain propagation has failed to
      // converge for `jumpAfter` rounds — near-dup graphs (small dense
      // clusters) settle in 2-3 rounds and never pay the extra join; only
      // the pathological long-path shapes that actually need shortcutting
      // reach it (measured: +35 % on q83 when unconditional, 0 % gated).
      val next = (if (it < jumpAfter) prop
        else prop
          .join(prop.select(col("node").as("component"),
            col("component").as("jump")), Seq("component"), "left")
          .select(col("node"), col("old"),
            coalesce(col("jump"), col("component")).as("component")))
        .localCheckpoint()
      converged = next.filter(col("component") =!= col("old")).isEmpty
      // `next` is materialized (eager localCheckpoint) and the convergence
      // check has run: release the superseded round's blocks — without
      // this the loop holds up to maxIter persisted copies of the label
      // set in the block manager at once
      checkpointedRdd(labels).foreach(_.unpersist(blocking = false))
      labels = next
      onRound(it, (System.nanoTime() - roundT0) / 1e9, it >= jumpAfter,
        converged)
      it += 1
    }
    checkpointedRdd(edges).foreach(_.unpersist(blocking = false))
    require(converged,
      s"connected components did not converge in $maxIter rounds")
    labels.select("node", "component") // shed the convergence carry column
  }
}
