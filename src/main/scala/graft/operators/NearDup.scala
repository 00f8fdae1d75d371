package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reusable near-duplicate detection over a (id, text) corpus:
  * word-shingling → MinHash signatures → LSH banding → bucket equi-join
  * candidates → exact-Jaccard verification. The public API behind q35,
  * parameterized for corpus-specific tuning.
  *
  * Scale contract: per-document work (shingles, signatures, band hashes)
  * is a native one-pass expression ([[graft.functions.MinHashBands]]);
  * the only corpus-wide operations are a shuffle keyed by (band, hash)
  * and the candidate-pair verification join — never an all-pairs product.
  * Banding theory: with r rows/band and b bands, a pair with Jaccard j
  * collides in ≥1 band with p = 1-(1-j^r)^b; the defaults (b=32, r=4)
  * give p ≈ 1-5e-8 at j=0.8.
  */
object NearDup {

  /** Distinct word `n`-gram shingle sets per document (docs with fewer
    * than `n` words are dropped). Native one-pass expression
    * ([[graft.functions.WordShingles]]) — the former
    * `transform(sequence(...))` formulation paid an interpreted lambda
    * per shingle of the corpus. Sets are SORTED per document (once, at
    * shingling time) so the verify join's per-PAIR intersection runs as
    * an allocation-free merge walk ([[graft.functions.IntersectSize]])
    * instead of a hash-set build per candidate — order is semantically
    * invisible (every consumer treats the column as a set). */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, spread: Boolean = true): DataFrame = {
    graft.functions.Registry.install(docs.sparkSession)
    // the shingle/MINHASH kernels are the pipeline's per-doc CPU; a
    // single-split corpus would run them (and hand every downstream
    // stage) one task — spread by doc id first, no-op at scale.
    // `spread = false` for callers whose per-doc kernel is one cheap hash
    // pass ([[exactPairs]]): there the explicit repartition pins every
    // scan of the persisted shingle set at full core count — measured as
    // ~6 cached-scan stages × 32 task launches over kilobyte slices —
    // while AQE's byte-based sizing runs the whole join-dominated
    // pipeline in a handful of tasks. No-op at scale either way.
    val base = if (spread) Spread.toCores(docs, col(idCol)) else docs
    base
      .withColumn("shingles", array_sort(expr(s"word_shingles($textCol, $n)")))
      .filter(size(col("shingles")) > 0)
      .select(col(idCol).as("doc_id"), col("shingles"))
  }

  /** Candidate pairs via MinHash-LSH banding (doc_a < doc_b, distinct). */
  def candidates(spark: SparkSession, shingled: DataFrame,
      numPerms: Int = 128, numBands: Int = 32): DataFrame = {
    graft.functions.Registry.install(spark)
    val bands = shingled.select(col("doc_id"),
      posexplode(expr(s"minhash_bands(shingles, $numPerms, $numBands)"))
        .as(Seq("band", "h")))
    bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Exact-Jaccard verification of candidate pairs against a threshold.
    * Runs once per CANDIDATE, the pipeline's hottest loop: the
    * intersection is a native merge walk over the per-doc sorted sets
    * (see [[shingles]]) — `array_intersect` would build a hash set and
    * materialize the intersection array per pair (measured 20 s of a
    * 27 s q56 at 371 k candidates; the walk is ~10×cheaper). */
  def verify(cand: DataFrame, shingled: DataFrame, threshold: Double): DataFrame =
    cand
      .join(shingled.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shingled.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("inter", expr("intersect_size(sa.shingles, sb.shingles)"))
      .withColumn("uni",
        size(col("sa.shingles")) + size(col("sb.shingles")) - col("inter"))
      .withColumn("jaccard", round(col("inter") * lit(1.0) / col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** Exact n-gram-Jaccard pairs — the non-probabilistic sibling of
    * [[pairs]], with PPJoin-style prefix filtering for candidate
    * generation (Chaudhuri et al., "A Primitive Operator for Similarity
    * Joins"; Xiao et al., PPJoin). A naive shingle inverted-index join is
    * exact but explodes on frequent shingles: a shingle shared by d
    * documents emits d·(d-1)/2 candidates, and template/stopword shingles
    * make that quadratic (measured: 0.8 s at 500 docs → 199 s at 5 000).
    *
    * Prefix filtering keeps it exact AND bounded: order every document's
    * shingles by a global total order (ascending document frequency, then
    * the shingle itself) and keep only the first n − ⌈t·n⌉ + 1 — the
    * RAREST — as its "prefix". Two sets with Jaccard ≥ t must share at
    * least one prefix shingle (if all shared tokens sat outside one
    * prefix, the overlap could be at most n − prefixLen = ⌈t·n⌉ − 1 <
    * t·|union|), so joining prefixes loses nothing, while the join keys
    * are by construction the LOW-frequency shingles. Candidates are then
    * verified with the same exact array-intersect Jaccard as the LSH
    * path. Full recall at any threshold, no tuning knob.
    */
  def exactPairs(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    // The whole exact pipeline runs on HASHED token sets (sorted
    // array<long>, [[graft.functions.Hash64Sorted]]): postings and
    // candidate join keys are 8-byte longs instead of ~24-byte strings,
    // and the verification payload — the term that dominated shuffle at
    // 100× corpus scale once the verify join outgrows broadcast — is ~3×
    // smaller. Jaccard over the hashed sets equals Jaccard over the
    // string sets modulo 64-bit collisions (~1e-13 per doc).
    val sh = shingles(docs, idCol, textCol, shingleSize, spread = false)
      .withColumn("shingles", expr("hash64_sorted(shingles)"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    verify(exactCandidates(sh, threshold), sh, threshold).orderBy("doc_a", "doc_b")
  }

  /** Document-frequency cap above which a token's posting list takes the
    * histogram-filtered hot path in [[exactCandidates]]. At the driver
    * corpus (sf0.1) the max shingle df is 25, so base-scale plans never
    * enter it. Note the df-ascending prefix ordering already SELF-HEALS
    * against frequency skew — as a token's df grows it sorts later and
    * falls out of every prefix (measured on the 100× probe: zero hot
    * tokens in any prefix even with every token replicated 100×) — so
    * this path is insurance for the corpus shape the ordering can't fix:
    * template docs whose ENTIRE vocabulary is frequent, where hot tokens
    * are the only prefix material left. */
  private[graft] val HotDf = 64

  /** Bucket count for the per-doc token histograms on the hot path:
    * byte buckets, so 256 costs a 256-byte posting payload. Needs to sit
    * WELL above the typical token count per doc (~52 at the driver
    * corpus) — at k near the token count, hash-collision noise lifts
    * Σmin to the overlap requirement and the bound stops pruning. */
  private[graft] val HistBuckets = 256

  /** PPJoin candidate generation for [[exactPairs]]: prefix-filter join
    * plus the companion length filter. Package-visible so specs can
    * measure candidate volume directly. */
  private[graft] def exactCandidates(sh: DataFrame, threshold: Double,
      hotDf: Int = HotDf): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.Registry.install(sh.sparkSession)
    // n (the doc's set size) rides along from size(shingles) — computing
    // it with a count-over-window would add a second Window pass
    val tokens = sh.select(col("doc_id"), size(col("shingles")).as("n"),
      explode(col("shingles")).as("shingle"))
    val byDoc = Window.partitionBy("doc_id")
    // document frequency as a WINDOW COUNT over the shingle partition,
    // not groupBy + join back: the join spelling scanned the shingle set
    // twice and shuffled the token rows by shingle anyway (no partial
    // agg on a join side), so the window is the same shuffle with one
    // fewer exchange and one fewer scan. Shingles are distinct per doc,
    // so count-over-partition == the groupBy count exactly.
    // persisted: the prefix set feeds both sides of the candidate
    // self-join, and without it the windows recompute per branch (same
    // reasoning as the signature persist in [[pairs]])
    val prefix = tokens
      .withColumn("df", count(lit(1)).over(Window.partitionBy("shingle")))
      .withColumn("rn", row_number().over(byDoc.orderBy(col("df"), col("shingle"))))
      .filter(col("rn") <= col("n") - ceil(col("n") * threshold) + 1)
      .select("doc_id", "shingle", "n", "rn", "df")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // PPJoin length filter: J(a,b) ≥ t forces |∩| ≥ t·max(|a|,|b|) while
    // |∩| ≤ min(|a|,|b|), so min ≥ t·max — pairs with a hopeless size
    // ratio never reach exact verification. The epsilon keeps the
    // exclusion conservative under FP (0.8·35 = 28.000000000000004 must
    // not reject min = 28); a spared borderline pair just gets verified.
    //
    // PPJoin POSITIONAL filter: J ≥ t also forces |∩| ≥ α = ⌈t·(n_a+n_b)
    // /(1+t)⌉. Both docs' token lists are sorted by the SAME global
    // (df, shingle) order, so for a match at 1-based positions (rn_a,
    // rn_b), every other common token lies strictly after both — overlap
    // ≤ 1 + min(n_a−rn_a, n_b−rn_b). A qualifying pair's FIRST common
    // token always passes this bound (later matches may not, but the
    // survivors are a union over match events, so nothing is lost); a
    // low-threshold join (q56 runs t=0.45, where the prefix alone keeps
    // over half of each doc) sheds most spurious matches here, BEFORE
    // the distinct shuffle and the per-pair verification.
    val joinCond =
      col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
        least(col("a.n"), col("b.n")).cast("double") >=
          greatest(col("a.n"), col("b.n")) * lit(threshold) - lit(1e-9) &&
        (lit(1) + least(col("a.n") - col("a.rn"), col("b.n") - col("b.rn")))
          .cast("double") >=
          (col("a.n") + col("b.n")) * lit(threshold / (1 + threshold)) - lit(1e-9)
    val pair = Seq(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))

    // DF-AWARE HOT-TOKEN BOUND: a token with document frequency d fans
    // its posting list into O(d²) match events, and at 100× replication
    // the frequent tokens dominate candidate shuffle (measured ~12×
    // above linear on the scale probe before this split). Tokens with
    // df > hotDf therefore join with an EXTRA exact pruning condition:
    // each hot posting carries its doc's token histogram
    // ([[graft.functions.TokenHistogram]]), and a match event survives
    // only if Σᵢ min(histA[i], histB[i]) — a provable upper bound on
    // |A ∩ B| — reaches the threshold's overlap requirement
    // α = t/(1+t)·(n_a+n_b). Pairs sharing a cold token are found by the
    // cold join unconditionally; pairs sharing ONLY hot tokens pass the
    // histogram test whenever they truly qualify (the bound never
    // undercounts), so the split loses no pairs: exactness holds, while
    // dissimilar docs that merely share template/stopword shingles die
    // BEFORE the distinct shuffle instead of at verification.
    val cold = prefix.filter(col("df") <= hotDf)
    val coldCand = cold.as("a").join(cold.as("b"), joinCond).select(pair: _*)
    // Hot-token probe BEFORE planning the hot branch: one limit-1 scan of
    // the just-persisted prefix set decides whether any hot posting
    // exists at all. The df-ascending prefix ordering self-heals against
    // frequency skew (hot tokens sort out of prefixes — see [[HotDf]]),
    // so the NO-hot case is the common one at every measured scale, and
    // there the probe saves planning AND executing an entire second join
    // pipeline (sketch pass, histogram join, union) that would run as
    // empty stages. The probe also forces the prefix cache exactly once,
    // so the cold self-join's two branches never race to materialize it.
    // Candidate set unchanged either way: with no hot posting the hot
    // branch is definitionally empty.
    val hasHot = !prefix.filter(col("df") > hotDf).isEmpty
    if (!hasHot) return coldCand.distinct()
    // sketches only for docs that actually carry hot prefix postings (a
    // left-semi first). A doc too large for the byte sketch gets a NULL
    // histogram (TokenHistogram kernels) — coalesce(…, true) passes such
    // match events straight to exact verification: no bound, never a drop.
    val hotPost = prefix.filter(col("df") > hotDf)
    val hists = sh
      .join(hotPost.select("doc_id").distinct(), Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        expr(s"token_histogram(shingles, $HistBuckets)").as("hist"))
    val hot = hotPost.join(hists, "doc_id")
    val hotCand = hot.as("a")
      .join(hot.as("b"), joinCond &&
        coalesce(
          expr("overlap_bound(a.hist, b.hist)").cast("double") >=
            (col("a.n") + col("b.n")) * lit(threshold / (1 + threshold)) - lit(1e-9),
          lit(true)))
      .select(pair: _*)
    coldCand.union(hotCand).distinct()
  }

  /** Full pipeline: near-dup pairs with exact Jaccard >= threshold.
    * The shingle sets feed four plan branches (both sides of the band
    * self-join via the signatures, both sides of the verification join),
    * so they are persisted once instead of recomputing the per-document
    * shingling/minhash work per branch — on a cluster this is the
    * standard LSH-job pattern (persist or checkpoint the signature set).
    */
  def pairs(spark: SparkSession, docs: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, threshold: Double = 0.8,
      numPerms: Int = 128, numBands: Int = 32): DataFrame = {
    val sh = shingles(docs, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // candidates come from MinHash signatures over the STRING shingles
    // (keeps signature values stable); verification — the join that drags
    // a token set per candidate through an exchange at scale — runs on
    // the hashed-long sets, same payload cut as [[exactPairs]] (Jaccard
    // identical modulo 64-bit collisions, so the pair set is unchanged)
    val hsh = sh.withColumn("shingles", expr("hash64_sorted(shingles)"))
    verify(candidates(spark, sh, numPerms, numBands), hsh, threshold)
      .orderBy("doc_a", "doc_b")
  }
}
