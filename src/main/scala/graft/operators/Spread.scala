package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism guard for compute-dense pipeline stages (guide §2.5):
  * AQE's partition coalescing and the scan's split packing are BYTE-based,
  * so a small-but-CPU-heavy input (per-doc minhash kernels, archive
  * decode, quadratic verify joins) can land on ONE task while 31 cores
  * idle — bytes say "tiny", compute says "hours". [[toCores]] hash-
  * repartitions such an input across the cluster's default parallelism
  * ONLY when it is under-parallel; inputs that already carry enough
  * partitions (the many-files layout any real corpus has at scale) pass
  * through untouched, keeping the scale path exchange-free. The key is
  * always an explicit column (deterministic placement under task retry —
  * guide §2.5 on round-robin repartition), and the explicit partition
  * count is user-specified, so AQE never re-coalesces it.
  */
object Spread {
  def toCores(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target, key)
  }
}
