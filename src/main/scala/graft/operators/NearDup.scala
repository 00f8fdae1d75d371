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

  /** Distinct word `n`-gram shingle sets per document. */
  def shingles(docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3): DataFrame =
    docs
      .withColumn("__words", split(col(textCol), " "))
      .filter(size(col("__words")) >= n)
      .withColumn("shingles", array_distinct(expr(
        s"""transform(sequence(1, size(__words) - ${n - 1}),
           |          i -> concat_ws(' ', ${(0 until n)
            .map(k => s"element_at(__words, i + $k)").mkString(", ")}))""".stripMargin)))
      .select(col(idCol).as("doc_id"), col("shingles"))

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

  /** Exact-Jaccard verification of candidate pairs against a threshold. */
  def verify(cand: DataFrame, shingled: DataFrame, threshold: Double): DataFrame =
    cand
      .join(shingled.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(shingled.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("inter", size(array_intersect(col("sa.shingles"), col("sb.shingles"))))
      .withColumn("uni",
        size(col("sa.shingles")) + size(col("sb.shingles")) - col("inter"))
      .withColumn("jaccard", round(col("inter") * lit(1.0) / col("uni"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** Exact n-gram-Jaccard pairs via a shingle inverted-index join — the
    * non-probabilistic sibling of [[pairs]]. Candidate generation is the
    * classic inverted index: explode each document's distinct shingles
    * and equi-join on the shingle, so the only corpus-wide shuffle is
    * keyed by shingle (never an all-pairs product), then candidates are
    * verified with the same exact array-intersect Jaccard as the LSH
    * path. Unlike LSH this recalls EVERY pair above the threshold.
    *
    * Scale note: the inverted index is O(total shingle occurrences) and
    * a shingle shared by d documents emits d·(d-1)/2 candidate rows, so
    * stopword-heavy shingles dominate the join at corpus scale.
    * `maxShingleDf` drops shingles appearing in more than that many
    * documents before the pair join (the standard frequent-n-gram cut in
    * web-scale dedup pipelines); pairs whose every common shingle is that
    * frequent are then missed, which is why the default is exact/no-cap
    * and the cap is an explicit scale/recall trade the caller opts into.
    */
  def exactPairs(spark: SparkSession, docs: DataFrame, idCol: String,
      textCol: String, shingleSize: Int = 3, threshold: Double = 0.8,
      maxShingleDf: Option[Int] = None): DataFrame = {
    val sh = shingles(docs, idCol, textCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inverted = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val kept = maxShingleDf.fold(inverted) { cap =>
      inverted.withColumn("__df",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy("shingle")))
        .filter(col("__df") <= cap).drop("__df")
    }
    val cand = kept.as("a")
      .join(kept.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    verify(cand, sh, threshold).orderBy("doc_a", "doc_b")
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
    verify(candidates(spark, sh, numPerms, numBands), sh, threshold)
      .orderBy("doc_a", "doc_b")
  }
}
