package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact cosine-threshold self-join over an embedding column ("find every
  * pair with cos ≥ τ"), expressed as a block-replicated EQUI-join instead
  * of the nested-loop product a theta-join (`a.vec_id < b.vec_id`) plans.
  *
  * Why not a candidates-only LSH path: at the registry's τ = 0.45 the
  * per-hyperplane collision probability for a just-qualifying pair is
  * 1 − acos(0.45)/π ≈ 0.648, so bands tight enough for ≥ 0.999 recall
  * (e.g. 2 bits × 13 tables) admit 1 − (1 − 2⁻²)¹³ ≈ 97.6 % of RANDOM
  * pairs as candidates — the cross product with extra shuffles. Measured
  * on the driver fixtures: every qualifying pair sits in [0.45, 0.52]
  * (none above 0.6), exactly the regime where sign-LSH cannot separate;
  * triangle-inequality cell pruning is equally dead (mean cell radius
  * 0.99 vs the τ-ball radius √(2−2τ) ≈ 1.05 — the corpus is one blob on
  * the 64-d sphere). An exact threshold join at low τ is Θ(N²) compute by
  * problem statement; what an engine CAN control is how that compute is
  * laid out. For genuinely-near duplicates (τ ≥ 0.8) sign-LSH prunes
  * well — that approximate path exists as [[graft.queries.Llm.lshTopK]]
  * (q38) and IVF (q50); this operator is the exact path.
  *
  * Layout: the build side hashes each vector into one of `b` blocks; the
  * probe side replicates each vector to ALL `b` block ids (one
  * `explode(sequence)` — no grid table, no driver-side pair list). The
  * join is then a plain equi-join on the block id:
  *
  *   - every ordered pair meets exactly once (probe row x carries every
  *     block id, so it meets y in y's one block); `vec_a < vec_b` keeps
  *     one orientation, applied BEFORE the cosine so the discarded half
  *     costs a comparison, not a dot product;
  *   - shuffle is N·b + N rows (b ≈ N/4096, capped) — the O(N²) work
  *     happens inside tasks, never as shuffle volume;
  *   - every block-id partition holds N probe rows × N/b build rows, so
  *     task work is uniform BY CONSTRUCTION (hash blocks, full
  *     replication) — no skew, no straggler, unlike the triangle-grid
  *     layout where partition j carries (j+1)/b of the work;
  *   - task memory is bounded by the build block (~`blockRows` vectors
  *     up to blockRows×maxBlocks ≈ 16.8M rows; N/maxBlocks beyond — see
  *     [[blockCount]]), not the corpus — a 1000-executor cluster streams
  *     the probe side through hash-join tasks of a few MB each.
  *
  * The plan contains only Generate + shuffle/broadcast HASH join —
  * no BroadcastNestedLoopJoin, no CartesianProduct (PlanSpec enforces
  * this for q39; EmbeddingJoinSpec pins equality with the brute-force
  * product on the driver fixtures).
  *
  * Reference behavior: embedding-cosine near-dup over the corpus, the
  * curation step the reference's pipeline narrative implies for vector
  * data (aws-community-builders-presentation.md's dedup/quality stage);
  * semantics fixed by q39's DuckDB all-pairs oracle.
  */
object EmbeddingJoin {

  /** b ≈ N/blockRows keeps per-task build sides small; the floor keeps
    * enough distinct join keys for cluster parallelism (relaxed when N is
    * small enough that even one block is a trivial task — no point paying
    * 32× replication on a fixture), and the cap bounds probe-side
    * replication (shuffle = N·b).
    *
    * The "task memory ≈ blockRows vectors" bound holds up to
    * blockRows×maxBlocks ≈ 16.8M rows; past that the cap wins and the
    * per-task build block grows as N/maxBlocks — the deliberate tradeoff
    * of bounding SHUFFLE volume at ≤ maxBlocks·N rows instead. At N = 1e9
    * that is ~244k vectors (~125 MB at 64-d) per task: still executor-
    * sized, and callers who want the other side of the tradeoff pass
    * `blocks` explicitly. (At that N the Θ(N²) cosine count, not layout,
    * is the real cost — use the approximate paths.) */
  private[graft] def blockCount(n: Long, blockRows: Int = 4096,
      minBlocks: Int = 32, maxBlocks: Int = 4096): Int = {
    val byRows = ((n + blockRows - 1) / blockRows).toInt
    // small-N floor: n/64 instead of n/256 — a block is the operator's
    // parallelism unit (one task per block, pinned below), and at fixture
    // sizes the old floor left a 2000-vector corpus on 7 tasks; n/64 keeps
    // per-block replication trivial (shuffle = N·b rows of a few hundred
    // bytes) while letting the Θ(N²/b)-per-task cosine work spread. At
    // N ≥ 131k `byRows` dominates and nothing changes.
    val floor = math.min(minBlocks.toLong, math.max(1L, n / 64)).toInt
    math.min(maxBlocks, math.max(floor, byRows))
  }

  /** All pairs (vec_a < vec_b) with round(cos, 4) ≥ tau — exact, matching
    * the all-pairs oracle bit-for-bit (cosine via the codegen'd
    * [[graft.functions.CosineSimilarity]], same IEEE op order as DuckDB's
    * `list_cosine_similarity`).
    *
    * @param e      input with an id column and an array<double> column
    * @param blocks override the block count (0 = size from a count over
    *               the id column only — column pruning keeps the sizing
    *               pass from re-reading/re-casting the embedding column,
    *               though it is still one extra pass over the source)
    */
  def exactPairs(e: DataFrame, idCol: String, vCol: String, tau: Double,
      blocks: Int = 0): DataFrame = {
    graft.functions.Registry.install(e.sparkSession)
    val b = if (blocks > 0) blocks else blockCount(e.select(idCol).count())
    // one task PER BLOCK, pinned with an explicit repartition: the
    // post-shuffle partitions are byte-tiny (vectors are a few hundred
    // bytes) but compute-quadratic, and AQE's size-based coalescing —
    // blind to compute — folded the whole join into ONE task (measured
    // 1.6 s single-threaded at N=2000; guide §2.5: max/median skew, here
    // manufactured by the coalesce). An explicit partition count is
    // user-specified, so AQE leaves it alone; b scales with N, so the
    // pinning is the cluster layout too, not a local knob.
    val probe = e.select(col(idCol).as("vec_a"), col(vCol).as("qv"))
      .withColumn("blk", explode(sequence(lit(0), lit(b - 1))))
      .repartition(b, col("blk"))
    val build = e.select(col(idCol).as("vec_b"), col(vCol).as("nv"),
      pmod(hash(col(idCol)), lit(b)).as("blk"))
      .repartition(b, col("blk"))
    probe.join(build, Seq("blk"))
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos_sim", round(expr("cosine_sim(qv, nv)"), 4))
      .filter(col("cos_sim") >= tau)
      .select("vec_a", "vec_b", "cos_sim")
  }
}
