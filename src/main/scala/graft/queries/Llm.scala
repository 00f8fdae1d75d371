package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Training-data-pipeline operators over `documents` / `embeddings`
  * (FIXTURES.md §B): deduplication (exact, MinHash-LSH, SimHash, n-gram
  * Jaccard), similarity search (brute-force + LSH-bucketed ANN), text
  * analysis (stats, language-ID, token counting, fingerprinting), and the
  * multimodal binary-column plumbing.
  *
  * Scale design (the 100 TB contract):
  *  - nothing all-pairs except where the smaller side is broadcastable;
  *    near-dup candidate generation is LSH-bucketed (shuffle on the band
  *    hash, never a cross join of the corpus with itself);
  *  - per-document work (shingling, signatures, hashes) is expressed as
  *    codegen'd array expressions (`transform`/`aggregate`) — no UDFs, no
  *    driver collects, embarrassingly parallel over partitions;
  *  - every aggregate shuffles on a key whose cardinality grows with the
  *    data (doc_id, band hash), so no hot reducer at 1000 executors.
  */
object Llm {

  // Registry.install on BOTH loaders: a query must not depend on an
  // earlier query having registered the native functions — q36 resolved
  // `simhash32` only after a Registry-installing query had run in the
  // same session, which held in the bench (registry installed up front)
  // but not in Verify's iteration order, so its correctness row was
  // silently missing from rounds 3-6.
  private def docs(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.install(s)
    Tables.load(s, dir, "documents")
  }
  private def emb(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.install(s)
    Tables.load(s, dir, "embeddings")
      .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
  }

  /** Cosine similarity via the native codegen'd expression
    * ([[graft.functions.CosineSimilarity]]): sequential fold in element
    * order — deterministic and bit-identical to the DuckDB oracle. */
  private def cosine(a: String, b: String) = expr(s"cosine_sim($a, $b)")

  // ------------------------------------------------------------- q30
  // Exact dedup: hash-groupBy on content, keep lowest doc_id per group
  // (at 100 TB: one shuffle on a 128-bit content hash; identical layout).
  def q30(s: SparkSession, dir: String): DataFrame =
    graft.operators.Dedup.groups(docs(s, dir), "text", "doc_id")
      .orderBy("keep_doc_id")

  val q30Sql =
    """SELECT min(doc_id) AS keep_doc_id, count(*) AS dup_count
      |FROM documents GROUP BY text ORDER BY keep_doc_id""".stripMargin

  // ------------------------------------------------------------- q31
  // Text quality statistics: word counts, average word length, stopword
  // ratio, composite quality score — all codegen'd array expressions.
  def q31(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("n_stop",
        expr("size(filter(words, x -> x IN ('the', 'a')))").cast("long"))
      .withColumn("n_alpha", length(regexp_replace(col("text"), " ", "")).cast("long"))
      .select(
        col("doc_id"),
        col("n_words"),
        size(array_distinct(col("words"))).cast("long").as("n_uniq_words"),
        round(col("n_alpha") * lit(1.0) / col("n_words"), 4).as("avg_word_len"),
        round(col("n_stop") * lit(1.0) / col("n_words"), 4).as("stopword_ratio"),
        round(least(lit(1.0), col("n_words") / lit(100.0))
          * (lit(1.0) - col("n_stop") * lit(1.0) / col("n_words")), 4).as("quality_score"))
      .orderBy("doc_id")

  val q31Sql =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS words,
      |         len(replace(text, ' ', '')) AS n_alpha,
      |         len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) AS n_stop
      |  FROM documents)
      |SELECT doc_id, len(words) AS n_words,
      |       len(list_distinct(words)) AS n_uniq_words,
      |       round(n_alpha * 1.0 / len(words), 4) AS avg_word_len,
      |       round(n_stop * 1.0 / len(words), 4) AS stopword_ratio,
      |       round(least(1.0, len(words) / 100.0) * (1.0 - n_stop * 1.0 / len(words)), 4) AS quality_score
      |FROM w ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q32
  // Language-ID via char-trigram profiles ([[graft.functions.LangId]] —
  // the Cavnar-Trenkle n-gram technique as a codegen'd native expression,
  // zero shuffles), reported as a confusion matrix against the labeled
  // lang column. The fixture's lang buckets all draw one shared
  // English-ish vocabulary (labels are synthetic), so the corpus is
  // UNIONED with embedded real-language samples (`LangId.samples`,
  // lang='real:xx') — those rows grade detection ACCURACY on real en /
  // de / fr / es text plus the CJK rule for zh, and the oracle inlines
  // the identical classifier and samples, so the matrix is hash-checked
  // end to end.
  def q32(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val samples = graft.functions.LangId.samples
      .toDF("doc_id", "lang", "text")
    docs(s, dir).select("doc_id", "lang", "text")
      .unionByName(samples)
      .withColumn("predicted_lang", expr("trigram_lang(text)"))
      .groupBy("lang", "predicted_lang")
      .agg(count(lit(1)).as("n_docs"))
      .orderBy("lang", "predicted_lang")
  }

  /** The same classifier spelled in DuckDB SQL, interpolated from the
    * SAME profile/sample constants — the two implementations cannot
    * drift apart without the hash catching it. */
  val q32Sql: String = {
    def triList(ts: Seq[String]) = ts.map(t => s"'$t'").mkString(", ")
    val profs = graft.functions.LangId.profiles.toMap
    val sampleRows = graft.functions.LangId.samples.map { case (id, lang, text) =>
      s"SELECT CAST($id AS BIGINT) AS doc_id, '$lang' AS lang, '${text.replace("'", "''")}' AS text"
    }.mkString("\n  UNION ALL ")
    val th = graft.functions.LangId.Threshold
    s"""WITH all_docs AS (
       |  SELECT doc_id, lang, text FROM documents
       |  UNION ALL $sampleRows),
       |g AS (
       |  SELECT lang, lower(text) AS lt,
       |         list_transform(range(1, length(lower(text)) - 1),
       |                        x -> substr(lower(text), CAST(x AS INT), 3)) AS tri
       |  FROM all_docs),
       |h AS (
       |  SELECT lang,
       |         regexp_matches(lt, '[\\x{4e00}-\\x{9fff}]') AS is_cjk,
       |         len(tri) AS n,
       |         len(list_filter(tri, x -> x IN (${triList(profs("de"))}))) AS h_de,
       |         len(list_filter(tri, x -> x IN (${triList(profs("en"))}))) AS h_en,
       |         len(list_filter(tri, x -> x IN (${triList(profs("es"))}))) AS h_es,
       |         len(list_filter(tri, x -> x IN (${triList(profs("fr"))}))) AS h_fr
       |  FROM g),
       |p AS (
       |  SELECT lang,
       |         CASE WHEN is_cjk THEN 'zh'
       |              WHEN n = 0 THEN 'unknown'
       |              WHEN greatest(h_de, h_en, h_es, h_fr) * 1.0 / n < $th THEN 'unknown'
       |              WHEN h_de >= h_en AND h_de >= h_es AND h_de >= h_fr THEN 'de'
       |              WHEN h_en >= h_es AND h_en >= h_fr THEN 'en'
       |              WHEN h_es >= h_fr THEN 'es'
       |              ELSE 'fr' END AS predicted_lang
       |  FROM h)
       |SELECT lang, predicted_lang, count(*) AS n_docs
       |FROM p GROUP BY 1, 2 ORDER BY lang, predicted_lang""".stripMargin
  }

  // ------------------------------------------------------------- q33
  // Token counting: whitespace tokens + a BPE-ish regex token count.
  def q33(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("ws_tokens", size(split(col("text"), " ")).cast("long"))
      .withColumn("re_tokens",
        expr("size(regexp_extract_all(text, '[a-z]+', 0))").cast("long"))
      .select(col("doc_id"), col("ws_tokens"), col("re_tokens"),
        round(length(col("text")).cast("long") * lit(1.0) / col("ws_tokens"), 4)
          .as("chars_per_token"))
      .orderBy("doc_id")

  val q33Sql =
    """SELECT doc_id, len(string_split(text, ' ')) AS ws_tokens,
      |       len(regexp_extract_all(text, '[a-z]+')) AS re_tokens,
      |       round(len(text) * 1.0 / len(string_split(text, ' ')), 4) AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q34
  // Document fingerprinting: rolling 8-char window hash (winnowing-lite) —
  // the fingerprint is the minimum hash over all sliding windows, a
  // shift-invariant content signature computed per-row with zero shuffle.
  // Native expression (functions.Fingerprint): one tight md5 loop per row
  // instead of an interpreted per-window lambda.
  def q34(s: SparkSession, dir: String): DataFrame = {
    graft.functions.Registry.install(s)
    docs(s, dir)
      .select(col("doc_id"),
        expr("fingerprint(text, 8)").as("fingerprint"))
      .orderBy("doc_id")
  }

  val q34Sql =
    """SELECT doc_id, min(md5(substr(text, CAST(i AS INT), 8))) AS fingerprint
      |FROM (SELECT doc_id, text,
      |             unnest(range(1, greatest(len(text) - 7, 1) + 1)) AS i
      |      FROM documents)
      |GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q35
  // Near-duplicate detection: 3-word shingles → 128-permutation MinHash
  // signature (per-row array expression, no shuffle) → 32 bands × 4 rows
  // LSH banding → candidate pairs via a bucket equi-join (shuffle on the
  // band hash — NEVER all-pairs) → exact-Jaccard verification of
  // candidates only. At threshold 0.8 the banding misses a true pair with
  // p < 1e-7, so the output equals the oracle's exact all-pairs answer.
  def q35(s: SparkSession, dir: String): DataFrame =
    graft.operators.NearDup.pairs(s, docs(s, dir), "doc_id", "text",
      shingleSize = 3, threshold = 0.8, numPerms = 128, numBands = 32)

  val q35Sql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY shingle IS NOT NULL),
      |ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |  FROM ds a JOIN ds b USING (shingle)
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE round(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------- q36
  // SimHash: 32-bit signature from per-word md5 bit votes, computed by
  // the native one-pass [[graft.functions.SimHash32]] expression — one
  // per-row loop over the distinct words, NO explode and NO shuffle
  // (the old formulation exploded doc × 32 bit positions and shuffled
  // twice; at corpus scale that is a multi-TB exchange for what is
  // logically a scan). Bit layout matches the SQL oracle exactly.
  def q36(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        expr("simhash32(array_distinct(split(text, ' ')))").as("simhash"))
      .orderBy("doc_id")

  // Deliberately dialect-minimal (q36 had no driver correctness row since
  // round 3; the old formulation's strpos/`//`/power() were the prime
  // suspects): a literal VALUES table carries (bit position, nibble index,
  // bit-in-nibble, power-of-two weight), nibble values come from a 16-arm
  // CASE, and bit extraction uses only integer `%` and comparisons.
  val q36Sql =
    """WITH wd AS (SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
      |h AS (SELECT doc_id, substr(md5(w), 1, 8) AS h8 FROM wd),
      |posmap(pos, ni, bi, pw) AS (VALUES
      |  (0,0,0,1),(1,0,1,2),(2,0,2,4),(3,0,3,8),
      |  (4,1,0,16),(5,1,1,32),(6,1,2,64),(7,1,3,128),
      |  (8,2,0,256),(9,2,1,512),(10,2,2,1024),(11,2,3,2048),
      |  (12,3,0,4096),(13,3,1,8192),(14,3,2,16384),(15,3,3,32768),
      |  (16,4,0,65536),(17,4,1,131072),(18,4,2,262144),(19,4,3,524288),
      |  (20,5,0,1048576),(21,5,1,2097152),(22,5,2,4194304),(23,5,3,8388608),
      |  (24,6,0,16777216),(25,6,1,33554432),(26,6,2,67108864),(27,6,3,134217728),
      |  (28,7,0,268435456),(29,7,1,536870912),(30,7,2,1073741824),(31,7,3,2147483648)),
      |nib AS (SELECT doc_id, pos, bi, CAST(pw AS BIGINT) AS pw,
      |          CASE substr(h8, ni + 1, 1)
      |            WHEN '0' THEN 0 WHEN '1' THEN 1 WHEN '2' THEN 2 WHEN '3' THEN 3
      |            WHEN '4' THEN 4 WHEN '5' THEN 5 WHEN '6' THEN 6 WHEN '7' THEN 7
      |            WHEN '8' THEN 8 WHEN '9' THEN 9 WHEN 'a' THEN 10 WHEN 'b' THEN 11
      |            WHEN 'c' THEN 12 WHEN 'd' THEN 13 WHEN 'e' THEN 14 ELSE 15 END AS nv
      |        FROM h, posmap),
      |b AS (SELECT doc_id, pos, pw,
      |        2 * (CASE bi
      |               WHEN 0 THEN nv % 2
      |               WHEN 1 THEN CASE WHEN nv % 4 >= 2 THEN 1 ELSE 0 END
      |               WHEN 2 THEN CASE WHEN nv % 8 >= 4 THEN 1 ELSE 0 END
      |               ELSE CASE WHEN nv >= 8 THEN 1 ELSE 0 END
      |             END) - 1 AS vote
      |      FROM nib),
      |v AS (SELECT doc_id, pos, max(pw) AS pw, CAST(sum(vote) AS BIGINT) AS v
      |      FROM b GROUP BY 1, 2)
      |SELECT doc_id, CAST(sum(CASE WHEN v >= 0 THEN pw ELSE 0 END) AS BIGINT) AS simhash
      |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q37
  // Similarity search, brute-force baseline: top-5 cosine neighbors for
  // the first 10 query vectors. The 10-row query side broadcasts
  // (BroadcastNestedLoopJoin), so the scan of the big side stays
  // partition-parallel; the LSH-bucketed variant (q38) is the path for
  // query sets that don't fit a broadcast.
  def q37(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cand = e.select(col("vec_id").as("neighbor_id"), col("v").as("nv"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    q.join(cand, col("query_id") =!= col("neighbor_id"))
      .withColumn("sim", cosine("qv", "nv"))
      .withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= 5)
      .select(col("query_id"), col("nn_rank"), col("neighbor_id"),
        round(col("sim"), 4).as("cos_sim"))
      .orderBy("query_id", "nn_rank")
  }

  val q37Sql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |sims AS (
      |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
      |         list_cosine_similarity(a.v, b.v) AS sim
      |  FROM e a JOIN e b ON b.vec_id != a.vec_id
      |  WHERE a.vec_id < 10)
      |SELECT query_id,
      |       row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS nn_rank,
      |       neighbor_id, round(sim, 4) AS cos_sim
      |FROM sims
      |QUALIFY nn_rank <= 5
      |ORDER BY query_id, nn_rank""".stripMargin

  // ------------------------------------------------------------- q38
  // LSH-bucketed ANN (the 100 TB path): random-hyperplane signatures
  // (deterministic planes from xxhash64 — see
  // [[graft.functions.HyperplaneBucket]]), bucket equi-join, exact cosine
  // re-rank within buckets. Approximate by construction, so the DRIVER
  // row is the quantified quality contract instead of the neighbor list:
  // q38 emits recall@5 of the LSH path against the exact q37 baseline
  // (both fully deterministic — seeded hyperplanes, fixed data), reduced
  // to (k, n_queries, recall_ok) so the DuckDB oracle checks it exactly.
  // AnnRecallSpec additionally pins the raw pair sets.
  //
  // Parameter model: a pair at cosine s collides per hyperplane with
  // p = 1 − arccos(s)/π, per table with p^bits, in ≥1 of L tables with
  // 1 − (1−p^bits)^L; candidate volume ≈ L·n/2^bits. The synthetic
  // corpus is near-isotropic (measured rank-5 neighbors at s ≈ 0.3 →
  // p ≈ 0.6), so 4 bits × 8 tables gives recall ≈ 0.66 at ~n/2
  // candidates — the honest LSH ceiling for random-ish vectors. Real
  // embedding corpora are clustered (neighbor s ≫ random), where the
  // same formula lets bits grow and candidates shrink.
  private val LshBits = 4
  private val LshTables = 8

  /** recall@k summary of an approximate top-k against the exact baseline:
    * one row (k, n_queries, recall_ok), every column computed from the
    * data — k from the baseline's rows-per-query, n_queries from its
    * distinct queries, recall_ok from the hit fraction vs `floor`. The
    * floors match AnnRecallSpec's: well under the observed recalls, so
    * they catch structural regressions (bucketing gone wrong degrades to
    * near-zero overlap) without flaking on parameter nudges. */
  private def recallSummary(approx: DataFrame, exact: DataFrame,
      floor: Double): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id"))
        .withColumn("hit", lit(1)), Seq("query_id", "neighbor_id"), "left")
      .agg(
        (count(lit(1)) / countDistinct(col("query_id"))).cast("long").as("k"),
        countDistinct(col("query_id")).as("n_queries"),
        ((count(col("hit")).cast("double") / count(lit(1))) >= floor)
          .as("recall_ok"))

  /** The LSH candidate path itself (bucket equi-join + exact re-rank),
    * shared by q38's recall summary and AnnRecallSpec. */
  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir)
    val withBucket = e.select(col("vec_id"), col("v"),
      explode(array((0 until LshTables).map(i =>
        struct(lit(i).as("tbl"),
          expr(s"lsh_bucket(v, $LshBits, $i)").as("bucket"))): _*)).as("tb"))
      .select(col("vec_id"), col("v"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = withBucket.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("tbl"), col("bucket"))
    val cand = withBucket
      .select(col("vec_id").as("neighbor_id"), col("v").as("nv"), col("tbl"), col("bucket"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("neighbor_id"))
    q.join(cand, Seq("tbl", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("qv"), col("neighbor_id"), col("nv")).distinct()
      .withColumn("sim", cosine("qv", "nv"))
      .withColumn("nn_rank", row_number().over(w))
      .filter(col("nn_rank") <= 5)
      .select(col("query_id"), col("nn_rank"), col("neighbor_id"),
        round(col("sim"), 4).as("cos_sim"))
      .orderBy("query_id", "nn_rank")
  }

  def q38(s: SparkSession, dir: String): DataFrame =
    recallSummary(lshTopK(s, dir), q37(s, dir), floor = 0.3)

  val q38Sql =
    "SELECT CAST(5 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_queries, true AS recall_ok"

  // ------------------------------------------------------------- q39
  // Embedding-cosine near-dup pairs above a threshold — exact, via the
  // block-replicated equi-join ([[graft.operators.EmbeddingJoin]]): same
  // Θ(N²) cosine count as the all-pairs oracle, but laid out as uniform
  // hash-join tasks with bounded memory and N·b shuffle rows instead of a
  // BroadcastNestedLoopJoin (why LSH banding can't do better at τ = 0.45
  // is measured and documented on the operator).
  def q39(s: SparkSession, dir: String): DataFrame =
    graft.operators.EmbeddingJoin.exactPairs(emb(s, dir), "vec_id", "v", 0.45)
      .orderBy("vec_a", "vec_b")

  val q39Sql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |       round(list_cosine_similarity(a.v, b.v), 4) AS cos_sim
      |FROM e a JOIN e b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(a.v, b.v), 4) >= 0.45
      |ORDER BY vec_a, vec_b""".stripMargin

  // ------------------------------------------------------------- q40
  // Multimodal plumbing: treat content as an opaque binary column with
  // typed metadata; the decode stub is a deterministic fake (byte length
  // modulo), the Spark-side schema/partitioning is real. The full
  // mapPartitions pipeline lives in graft.operators.Multimodal.
  def q40(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("content", col("text").cast("binary"))
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
      .select(col("doc_id"), col("n_bytes"),
        (col("n_bytes") % 256).as("stub_feature"),
        ceil(col("n_bytes") / 64.0).as("n_frames"))
      .orderBy("doc_id")

  val q40Sql =
    """SELECT doc_id, strlen(text) AS n_bytes,
      |       strlen(text) % 256 AS stub_feature,
      |       CAST(ceil(strlen(text) / 64.0) AS BIGINT) AS n_frames
      |FROM documents ORDER BY doc_id""".stripMargin

  // ------------------------------------------------------------- q50
  // IVF ANN (the second scale path besides LSH): a spherical k-means
  // coarse quantizer partitions the corpus into cells; a query probes its
  // 4 nearest cells and exact-reranks only their members. At 100 TB the
  // cell assignment is one codegen'd projection over the corpus (argmax
  // of 16 broadcast-literal cosine_sim columns — no shuffle, no ML
  // pipeline) and each probe touches ~nprobe/k of the corpus.
  // Approximate by construction → like q38, the driver row is the
  // recall@5 summary against the exact baseline (deterministic:
  // index-seeded Lloyd, fixed data), exactly checkable by the oracle.
  //
  // PARAMETER POLICY (not a fixed k): cells = clamp(16, ⌈√N⌉, 1024) —
  // the standard IVF sizing, so each cell holds ~√N vectors and a probe
  // touches ~nprobe·√N of the corpus instead of a fixed 1/16. The 1024
  // cap bounds BOTH the driver-side training sample (64 vectors/cell →
  // ≤ 64 k vectors ≈ 32 MB, still constant as the corpus grows past
  // cap²) and the centroid-literal projection the assignment pass
  // codegens. nprobe defaults to cells/4 (the probed fraction that held
  // recall at the fixed-16 configuration) and is caller-settable.
  private val IvfMinCells = 16
  private val IvfMaxCells = 1024

  private[graft] def ivfCells(n: Long): Int =
    math.min(n, math.min(IvfMaxCells.toLong,
      math.max(IvfMinCells.toLong,
        math.ceil(math.sqrt(n.toDouble)).toLong))).toInt.max(1)

  def ivfTopK(s: SparkSession, dir: String, nprobeArg: Int = 0): DataFrame = {
    val e = emb(s, dir)
    // one metadata-cheap count decides the cell budget
    val cells = ivfCells(e.count())
    val nprobe = if (nprobeArg > 0) nprobeArg else math.max(4, (cells + 3) / 4)
    // The coarse quantizer trains on a BOUNDED driver-side sample, never
    // the corpus: ≥64 vectors per centroid (capped at 64 k rows), so
    // training cost stays sublinear-then-CONSTANT as the corpus grows to
    // 100 TB (the limit pushes into the scan — GlobalLimit). Lloyd's on
    // ≤64k×64 doubles is milliseconds on the driver; the previous MLlib
    // pipeline spent ~2 s of distributed-job scheduling on the same
    // rows. Only the cell ASSIGNMENT pass touches every vector, and it
    // is a single whole-stage-codegen projection (cosine_sim is a
    // doGenCode expression).
    val sample = e.select(col("v")).limit(math.min(64 * cells, 65536)).collect()
      .map(_.getSeq[Double](0).toArray)
    val cents = Llm.lloyd(sample, k = cells, iters = 5)
    val cellSims = array(cents.map(c =>
      call_function("cosine_sim", col("v"), typedlit(c.toSeq))): _*)
    val assigned = e
      .withColumn("cell",
        (array_position(cellSims, array_max(cellSims)) - 1).cast("int"))
      .select(col("vec_id"), col("v"), col("cell"))
    import s.implicits._
    val centroids = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cv")
    val q = assigned.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cellRank = Window.partitionBy("query_id")
      .orderBy(col("cell_sim").desc, col("cell"))
    val probed = q.join(broadcast(centroids))
      .withColumn("cell_sim", cosine("qv", "cv"))
      .withColumn("cell_rank", row_number().over(cellRank))
      .filter(col("cell_rank") <= nprobe)
      .select("query_id", "qv", "cell")
    val nnRank = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    probed.join(assigned, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("sim", cosine("qv", "v"))
      .withColumn("nn_rank", row_number().over(nnRank))
      .filter(col("nn_rank") <= 5)
      .select(col("query_id"), col("nn_rank"),
        col("vec_id").as("neighbor_id"), round(col("sim"), 4).as("cos_sim"))
      .orderBy("query_id", "nn_rank")
  }

  /** Deterministic spherical k-means (cosine metric, mean update) on a
    * driver-side sample: initial centroids are k index-strided sample
    * vectors, so fixed data order → fixed cells, no RNG. Metric-
    * consistent with the probe and re-rank (both cosine), unlike a
    * Euclidean quantizer under a cosine query. */
  private def lloyd(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} smaller than k=$k")
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val dim = sample(0).length
    var cents = Array.tabulate(k)(i => sample(i * (sample.length / k)).clone())
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Int](k)
      sample.foreach { v =>
        var best = 0; var bestS = Double.NegativeInfinity; var c = 0
        while (c < k) {
          val sim = cos(v, cents(c))
          if (sim > bestS) { bestS = sim; best = c }
          c += 1
        }
        counts(best) += 1
        var j = 0
        while (j < dim) { sums(best)(j) += v(j); j += 1 }
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c) else sums(c).map(_ / counts(c)))
    }
    cents
  }

  def q50(s: SparkSession, dir: String): DataFrame =
    recallSummary(ivfTopK(s, dir), q37(s, dir), floor = 0.4)

  val q50Sql =
    "SELECT CAST(5 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_queries, true AS recall_ok"

  // ------------------------------------------------------------- q50b
  // IVF-PQ (Jégou et al. 2011): same coarse quantizer as q50, but the
  // candidate payload carried through the probe join is the M=8-byte PQ
  // code instead of the 64×8-byte vector — the ~64× memory cut that
  // binds at 100 TB embedding corpora (the index fits where the vectors
  // don't). Ranking uses cosine against the concatenated-centroid
  // reconstruction (the ADC approximation) through the SAME codegen'd
  // cosine_sim; both encode and decode are native expressions with the
  // codebook held as a plan reference object ([[graft.functions.Pq]]).
  // Training is deterministic (index-strided Lloyd per subspace on the
  // bounded driver sample; ksub clamps to the sample at tiny SF), so
  // the recall summary is oracle-checkable like q38/q50.
  private[graft] def ivfPqTopK(s: SparkSession, dir: String,
      nprobeArg: Int = 0): DataFrame = {
    val e = emb(s, dir)
    val cells = ivfCells(e.count())
    val nprobe = if (nprobeArg > 0) nprobeArg else math.max(4, (cells + 3) / 4)
    val sample = e.select(col("v")).limit(math.min(64 * cells, 8192)).collect()
      .map(_.getSeq[Double](0).toArray)
    val cents = Llm.lloyd(sample, k = cells, iters = 5)
    // RESIDUAL codebook (Jégou 2011 §III): PQ trains on v − nearest-cell
    // centroid, whose spread is a cell diameter rather than the whole
    // space — the precision that keeps recall@5 above the floor at every
    // corpus size (raw-vector PQ measured below it at 5 k vectors)
    val residuals = sample.map { v =>
      var best = 0; var bestS = Double.NegativeInfinity; var c = 0
      while (c < cents.length) {
        var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
        while (i < v.length) {
          dot += v(i) * cents(c)(i); na += v(i) * v(i)
          nb += cents(c)(i) * cents(c)(i); i += 1
        }
        val sim = dot / (math.sqrt(na) * math.sqrt(nb))
        if (sim > bestS) { bestS = sim; best = c }
        c += 1
      }
      Array.tabulate(v.length)(i => v(i) - cents(best)(i))
    }
    val cb = graft.functions.Pq.trainPq(residuals, m = 8, ksub = 256, iters = 3)
    val cbB64 = graft.functions.Pq.encodeCodebook(cb)
    val cellSims = array(cents.map(c =>
      call_function("cosine_sim", col("v"), typedlit(c.toSeq))): _*)
    import s.implicits._
    val centroids = cents.zipWithIndex
      .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "cv")
    // the INDEX: cell id + 8-byte residual code per vector — the full
    // vector is dropped here, which is the point
    val indexed = e
      .withColumn("cell",
        (array_position(cellSims, array_max(cellSims)) - 1).cast("int"))
      .join(broadcast(centroids), Seq("cell"))
      .withColumn("codes",
        call_function("pq_encode", col("v"), col("cv"), lit(cbB64)))
      .select(col("vec_id"), col("cell"), col("codes"))
    // queries keep exact vectors (10 rows — always exact on the query side)
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val cellRank = Window.partitionBy("query_id")
      .orderBy(col("cell_sim").desc, col("cell"))
    val probed = q.join(broadcast(centroids))
      .withColumn("cell_sim", cosine("qv", "cv"))
      .withColumn("cell_rank", row_number().over(cellRank))
      .filter(col("cell_rank") <= nprobe)
      .select("query_id", "qv", "cell", "cv")
    // ADC shortlist: rank candidates by cosine against the residual
    // reconstruction (8-byte codes only — no vector leaves the index),
    // keep the top 32 per query
    val adcRank = Window.partitionBy("query_id")
      .orderBy(col("adc_sim").desc, col("vec_id"))
    val shortlist = probed.join(indexed, Seq("cell"))
      .filter(col("query_id") =!= col("vec_id"))
      .withColumn("adc_sim", call_function("cosine_sim", col("qv"),
        call_function("pq_decode", col("codes"), col("cv"), lit(cbB64))))
      .withColumn("adc_rank", row_number().over(adcRank))
      .filter(col("adc_rank") <= 32)
      .select(col("query_id"), col("qv"), col("vec_id"))
    // REFINE (the standard IVF-PQ+R step, Jégou 2011 §V / FAISS
    // RefineFlat): the shortlist — 32 ids per query, never the corpus —
    // joins back to the stored vectors for an exact top-5 re-rank. At
    // 100 TB this reads k'·queries full vectors by key, which is what
    // bounds ADC's quantization noise away from the recall floor while
    // the scan path stays 8 bytes/vector.
    val nnRank = Window.partitionBy("query_id")
      .orderBy(col("sim").desc, col("vec_id"))
    shortlist
      .join(e.select(col("vec_id"), col("v").as("nv")), Seq("vec_id"))
      .withColumn("sim", cosine("qv", "nv"))
      .withColumn("nn_rank", row_number().over(nnRank))
      .filter(col("nn_rank") <= 5)
      .select(col("query_id"), col("nn_rank"),
        col("vec_id").as("neighbor_id"), round(col("sim"), 4).as("cos_sim"))
      .orderBy("query_id", "nn_rank")
  }

  def q50b(s: SparkSession, dir: String): DataFrame =
    recallSummary(ivfPqTopK(s, dir), q37(s, dir), floor = 0.4)

  val q50bSql =
    "SELECT CAST(5 AS BIGINT) AS k, CAST(10 AS BIGINT) AS n_queries, true AS recall_ok"

  // ------------------------------------------------------------- q47
  // Multimodal deep decode — REAL pixels, no codec library: the fixture
  // writer emits deterministic gradient images keyed by doc_id (24bpp BMP
  // — bottom-up AND top-down —, 8-bit PNG — RGB and RGBA, row filters
  // cycling through all five types —, and GIF — palette + LZW pixel
  // stream), [[graft.operators.PixelCodec]] reconstructs the actual pixel
  // array (BMP row arithmetic; PNG via Inflater + full filter
  // reconstruction; GIF via a from-scratch LZW decoder), and the features
  // are exact per-channel sums off those pixels. Gradient coefficients
  // are chosen so no channel value crosses 255 (no mod wraparound), which
  // gives the sums a closed form the DuckDB oracle recomputes bit-for-bit
  // — a decoder that misreads row order, stride padding, BGR order, a PNG
  // filter, the LZW code stream, or the alpha layout hash-mismatches.
  // JPEG payloads are REAL baseline JPEGs too ([[graft.operators
  // .JpegCodec]], a from-scratch T.81 Huffman+IDCT decoder): grayscale,
  // multi-MCU, per-8×8-block-constant gradients — with all-ones quant
  // tables a block-constant image is DC-only, so the entropy decode, DC
  // prediction chain, dequant, and IDCT reproduce the pixels EXACTLY and
  // the closed-form oracle still holds bit-for-bit. WebP rows are REAL
  // too ([[graft.operators.WebpCodec]], from-scratch VP8L: canonical
  // prefix codes + transforms — lossless, so the gradient sums hold
  // bit-for-bit). Rotation slots 6 and 7 (round 16) are the ARITHMETIC
  // JPEG frame types — sequential SOF9 and progressive SOF10 — the same
  // DC-only closed form entropy-coded through the from-scratch T.81 QM
  // coder ([[graft.operators.QmCoder]]): the "lossy codec" class
  // decoding for real, both ImageIO-cross-checked. Slot 7 is LOSSLESS
  // JPEG (SOF3, predictors rotating): exact for arbitrary pixels, so it
  // carries the FULL gradient like the PNG/BMP slots; slot 8 (round 16)
  // is BI_RLE8 run-length BMP — compressed, lossless, same gradient;
  // slot 9 (round 16) is HIERARCHICAL JPEG (T.81 Annex J: DHP sequence,
  // non-differential base frame, EXP bilinear doubling, differential
  // corrections — rotating the Huffman SOF0+SOF5 and arithmetic
  // SOF9+SOF13 DCT pyramids with the SOF7 LOSSLESS-refinement stage,
  // which reconstructs an arbitrary full-res gradient bit-exactly —
  // all stages exact by construction). All ten
  // rotation slots decode real pixels; the per-row `decoder`
  // label stays (q70/q71 exercise the stub contract).
  def q47(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // fixture build is a one-time layout step (fingerprint-cached, like
    // q09's partitioned rewrite) — the timed query measures DECODE
    val out47 = Tables.scratch(s"media47/${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    val mediaDir = Tables.cachedDerived(dir, out47,
      version = "v22-jpegtiff") {
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      ids.map { id =>
        val w = 3 + (id % 6).toInt
        val h = 2 + (id % 5).toInt
        val br = (id % 97).toInt
        val bg = ((id * 3) % 89).toInt
        val bb = ((id * 7) % 83).toInt
        // max channel value 96+3*7+5*5 = 142 < 255: no wraparound, so the
        // oracle's closed-form sums are exact
        def px(x: Int, y: Int): (Int, Int, Int) =
          (br + 3 * x + 5 * y, bg + 5 * x + 2 * y, bb + 2 * x + 7 * y)
        // real JPEG in THREE entropy spellings — Huffman SOF0, sequential
        // arithmetic SOF9, progressive arithmetic SOF10 — all the same
        // (1+id%3)×(1+id%2) MCUs of grayscale, constant per 8×8 block
        // (v = br + 7·bx + 11·by ≤ 121 < 255) → DC-only blocks,
        // bit-exact round-trip, one closed form for all three
        val jw = 8 * (1 + (id % 3).toInt)
        val jh = 8 * (1 + (id % 2).toInt)
        val jpx = (x: Int, y: Int) => {
          val v = br + 7 * (x / 8) + 11 * (y / 8)
          (v, v, v)
        }
        val bytes = (id % 10).toInt match {
          case 0 => graft.operators.PixelCodec.encodeBmp(w, h, px,
            topDown = (id / 8) % 2 == 1)
          case 1 =>
            // round 18: the PNG slot sub-rotates netpbm — binary P6 /
            // ASCII P3 / 16-bit-per-sample P6 (maxval 65535: v·257 on
            // disk, decode keeps the high byte → same closed form)
            if ((id / 10) % 2 == 1) ((id / 20) % 3).toInt match {
              case 0 => graft.operators.PixelCodec.encodePnm(w, h, 6, px)
              case 1 => graft.operators.PixelCodec.encodePnm(w, h, 3, px)
              case _ => graft.operators.PixelCodec.encodePnm(w, h, 6, px,
                maxval = 65535)
            }
            else graft.operators.PixelCodec.encodePng(w, h, px,
              withAlpha = (id / 8) % 2 == 1)
          case 2 =>
            // round 18: the GIF slot sub-rotates baseline TIFF — the
            // scanned-document workhorse — lossless RGB with rotating
            // compression (none / PackBits / LZW, optionally with the
            // horizontal predictor), real strip splits, both byte
            // orders; same gradient, same closed forms. Round 19 adds
            // the fourth compression: CCITT GROUP 4 (T.6) — bilevel by
            // nature, so its sub-slot carries diagonal stripes (black
            // iff (x+y+id)%3=0) whose black count the oracle recomputes
            if ((id / 10) % 2 == 1) {
              if ((id / 20) % 4 == 3)
                graft.operators.TiffCodec.encodeTiffG4(w, h,
                  (x, y) => (x + y + id) % 3 == 0,
                  bigEndian = (id / 40) % 2 == 1,
                  rowsPerStrip = 1 + (id % 3).toInt)
              else if ((id / 20) % 4 == 0 && (id / 40) % 2 == 0)
                // JPEG-in-TIFF sub-slot (round 19, compression 7): at
                // this geometry (w ≤ 8, h ≤ 6) the block-constant gray
                // is a SINGLE DC-only block = constant br, so all three
                // channel sums are w·h·br in closed form; tablesTag
                // rotates the abbreviated-stream spelling
                graft.operators.TiffCodec.encodeTiffJpegGray(w, h,
                  (x, y) => br + 7 * (x / 8) + 11 * (y / 8),
                  tablesTag = (id / 80) % 2 == 1)
              else {
                val comp = Seq("none", "packbits", "lzw")(((id / 20) % 4).toInt)
                // planar-2 spelling sub-rotation (round 19): separate
                // component planes, same pixels — oracle invariant
                graft.operators.TiffCodec.encodeTiffRgb(w, h, px, comp,
                  bigEndian = (id / 40) % 2 == 1,
                  rowsPerStrip = 1 + (id % 3).toInt,
                  predictor = comp == "lzw" && (id / 80) % 2 == 1,
                  planar2 = (id / 160) % 2 == 1)
              }
            } else graft.operators.PixelCodec.encodeGif(w, h, px)
          case 3 =>
            // sub-rotates the PRECISION since round 17: 8-bit baseline
            // SOF0 / 12-BIT extended SOF1 whose samples are 16× the same
            // gradient — the decoder's 8-bit output is exactly v >> 4,
            // so ONE closed form covers both spellings
            if ((id / 10) % 2 == 0)
              graft.operators.JpegCodec.encodeJpeg(jw, jh, jpx, gray = true)
            else graft.operators.JpegCodec.encodeJpeg12(jw, jh,
              (x, y) => 16 * (br + 7 * (x / 8) + 11 * (y / 8)))
          case 4 => // real WebP, sub-rotating LOSSLESS (VP8L, bit-exact
            // gradient) / LOSSY (VP8 intra keyframe, round 18): the
            // lossy half is grayscale constant per 4×4 block — DC-only
            // residuals through quant 4 reconstruct bit-exactly
            // ([[graft.operators.Vp8Codec]]), so the closed form holds
            // the same way the DC-only JPEG slots' does
            if ((id / 10) % 2 == 0)
              graft.operators.WebpCodec.encodeWebpLossless(w, h, px,
                subtractGreen = (id / 8) % 2 == 1)
            else
              graft.operators.Vp8Codec.encodeWebpLossyGray(
                16 * (1 + (id % 2)).toInt, 16,
                (bx4, by4) => br + 7 * bx4 + 11 * by4)
          case 5 => // round 16: sequential ARITHMETIC JPEG (QM coder);
            // round 18 sub-rotates 12-BIT SOF9 — samples 16× the same
            // gradient, decoded 8-bit output exactly v >> 4, so ONE
            // closed form covers both precisions (the SOF1 pattern)
            if ((id / 10) % 2 == 0)
              graft.operators.JpegCodec.encodeJpeg(jw, jh, jpx, gray = true,
                arith = true)
            else graft.operators.JpegCodec.encodeJpeg12(jw, jh,
              (x, y) => 16 * (br + 7 * (x / 8) + 11 * (y / 8)), spelling = 1)
          case 6 => // round 16: PROGRESSIVE arithmetic JPEG (SOF10);
            // round 18 sub-rotates its 12-BIT spelling and 12-bit
            // PROGRESSIVE HUFFMAN (SOF2) — same v >> 4 closed form
            if ((id / 10) % 3 == 0)
              graft.operators.JpegCodec.encodeJpegProgArith(jw, jh, jpx,
                gray = true)
            else if ((id / 10) % 3 == 1)
              graft.operators.JpegCodec.encodeJpegProgArith(jw, jh, null,
                gray12 = (x, y) => 16 * (br + 7 * (x / 8) + 11 * (y / 8)))
            else graft.operators.JpegCodec.encodeJpeg12(jw, jh,
              (x, y) => 16 * (br + 7 * (x / 8) + 11 * (y / 8)), spelling = 2)
          case 7 => // round 16: LOSSLESS JPEG — the only JPEG mode that
            // reproduces ARBITRARY pixels exactly, so this slot carries
            // the full per-pixel gradient (value ≤ 142 < 255);
            // predictors rotate, the ENTROPY spelling sub-rotates
            // (Huffman SOF3 / arithmetic SOF11 through the QM coder),
            // and since round 17 the Huffman half sub-rotates SHAPE too:
            // plain grayscale / row-aligned RESTART-INTERVAL grayscale /
            // 3-COMPONENT interleaved RGB (no color transform — the full
            // per-channel gradient, same closed forms as the BMP slot)
            // optionally restarted
            val pred = 1 + ((id / 9) % 7).toInt
            if ((id / 10) % 2 == 0) ((id / 20) % 4).toInt match {
              case 0 => graft.operators.JpegCodec.encodeJpegLossless(w, h,
                (x, y) => br + 3 * x + 5 * y, pred)
              case 1 => graft.operators.JpegCodec.encodeJpegLossless(w, h,
                (x, y) => br + 3 * x + 5 * y, pred,
                restartRows = 1 + (id % 3).toInt)
              case 2 => graft.operators.JpegCodec.encodeJpegLosslessRgb(w, h,
                (x, y) => {
                  val (r, g, bl) = px(x, y)
                  (r << 16) | (g << 8) | bl
                }, pred, restartRows = (id % 2).toInt)
              case _ => // 16-BIT precision: samples 256× the gradient,
                // 8-bit output = v >> 8 → the same closed form
                graft.operators.JpegCodec.encodeJpegLossless(w, h,
                  (x, y) => 256 * (br + 3 * x + 5 * y), pred,
                  precision = 16)
            }
            else ((id / 20) % 4).toInt match {
              // round 18: the ARITHMETIC half sub-rotates shape too —
              // plain grayscale / 16-BIT precision (samples 256×, 8-bit
              // output v >> 8, same closed form) / row-aligned RESTART
              // INTERVALS (QM coder + statistics reset at each RSTn) /
              // 3-component RGB (full per-channel gradient, same closed
              // forms as the Huffman RGB shape) — RGB composes restarts
              // too
              case 0 => graft.operators.JpegCodec.encodeJpegLosslessArith(w,
                h, (x, y) => br + 3 * x + 5 * y, pred)
              case 1 => graft.operators.JpegCodec.encodeJpegLosslessArith(w,
                h, (x, y) => 256 * (br + 3 * x + 5 * y), pred,
                precision = 16)
              case 2 => graft.operators.JpegCodec.encodeJpegLosslessArith(w,
                h, (x, y) => br + 3 * x + 5 * y, pred,
                restartRows = 1 + (id % 3).toInt)
              case _ => graft.operators.JpegCodec.encodeJpegLosslessArithRgb(
                w, h, (x, y) => {
                  val (r, g, bl) = px(x, y)
                  (r << 16) | (g << 8) | bl
                }, pred, restartRows = (id % 2).toInt)
            }
          case 8 => // round 16: BI_RLE8 BMP — the run-length coding,
            // lossless, so it carries the full gradient too; palette =
            // one entry per pixel cell, unit encoded runs + EOL/EOB
            graft.operators.PixelCodec.encodeBmpRle8(w, h,
              Array.tabulate(w * h) { k =>
                val (r, g, bl) = px(k % w, k / w)
                (r << 16) | (g << 8) | bl
              },
              (x, y) => y * w + x)
          case _ => // round 16/17: HIERARCHICAL JPEG (T.81 Annex J),
            // rotating SIX differential spellings by spell = (id/10)%6 —
            // chosen so spell%3 classifies the closed form exactly like
            // the round-16 3-way rotation (the oracle's selector is
            // unchanged):
            //  spell%3 ∈ {0,1} — DCT pyramids: 0 SOF0+SOF5 (Huffman
            //  sequential), 1 SOF9+SOF13 (arithmetic sequential),
            //  3 SOF0+SOF6 (Huffman PROGRESSIVE differential),
            //  4 SOF9+SOF14 (arithmetic progressive differential) — all
            //  four decode the SAME pixels: an 8×(8·hb) half-res
            //  row-tile gradient (br + 11·(y/8)) bilinear-upsampled 2×
            //  plus a checkerboard of block-constant +5 corrections;
            //  exact (DC-only blocks + closed-form J.1.1.2
            //  interpolation) →
            //  sums = 16·(16·(hb·br + 11·S1(hb)) + 6·(hb−1)) + 640·hb.
            //  spell%3 == 2 — LOSSLESS refinement: 2 SOF0+SOF7
            //  (Huffman), 5 SOF9+SOF15 (arithmetic) — the final stage
            //  recovers an ARBITRARY full-res gradient br + 3x + 2y
            //  bit-exactly (≤ 203 < 255) →
            //  sums = 16·hh·br + 360·hh + 16·hh·(hh−1), hh = 16·hb
            val spell = ((id / 10) % 6).toInt
            if (spell % 3 == 2)
              graft.operators.JpegCodec.encodeJpegHierLossless(
                8, 8 * (1 + (id % 2).toInt),
                (_, _) => br,
                (x, y) => br + 3 * x + 2 * y,
                arith = spell == 5)
            else
              graft.operators.JpegCodec.encodeJpegHier(
                8, 8 * (1 + (id % 2).toInt),
                (_, y) => br + 11 * (y / 8),
                (bx, by) => 5 * ((bx + by) % 2),
                arith = spell == 1 || spell == 4,
                progressiveDiff = spell >= 3)
        }
        (id, bytes)
      }.toDF("doc_id", "content")
        .write.mode("overwrite").parquet(s"$out47/data")
    }
    graft.operators.Multimodal.extractFeatures(s.read.parquet(s"$mediaDir/data"))
      .select(col("doc_id"), col("decoder"),
        col("width").cast("long").as("width"),
        col("height").cast("long").as("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))
      .orderBy("doc_id")
  }

  // ------------------------------------------------------------- q66
  // REAL multimodal metadata: the fixture writer emits actual container
  // bytes (PNG signature+IHDR / JPEG APP0-then-SOF0 segments / GIF89a
  // descriptor / RIFF-WEBP VP8 keyframe / BMP BITMAPINFOHEADER / TIFF
  // IFD — round 18, SHORT and LONG entry spellings) keyed
  // deterministically by doc_id, and the native
  // [[graft.functions.ImageMetaExpr]] parses format and pixel dimensions
  // back OFF THE BYTES — no codec library, pure header arithmetic. The
  // oracle recomputes the expected dimensions from doc_id, so a parser
  // that misreads any header (endianness, segment walk, offsets) hash-
  // mismatches. Decode runs per-row inside the scan projection: no
  // shuffle, no driver collect, payload bytes never leave the executor.
  def q66(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one-time fixture build, fingerprint-cached (see q47): the timed
    // query measures the header-parse scan, not the fixture write
    val out66 = Tables.scratch(s"media/${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    val mediaDir = Tables.cachedDerived(dir, out66, version = "v3-pnm") {
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      ids.map { id =>
        val fmt = (id % 7) match {
          case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"
          case 3 => "webp"; case 4 => "bmp"; case 5 => "tiff"
          case _ => "pnm"
        }
        (id, graft.functions.ImageMeta.encode(fmt,
          1 + (id % 640).toInt, 1 + (id % 480).toInt))
      }.toDF("doc_id", "content")
        .write.mode("overwrite").parquet(s"$out66/data")
    }
    s.read.parquet(s"$mediaDir/data")
      .select(col("doc_id"), expr("image_meta(content)").as("m"))
      .select(col("doc_id"),
        col("m.format").as("format"),
        col("m.width").cast("long").as("width"),
        col("m.height").cast("long").as("height"))
      .orderBy("doc_id")
  }

  val q66Sql =
    """SELECT doc_id,
      |       CASE CAST(doc_id % 7 AS INT) WHEN 0 THEN 'png'
      |            WHEN 1 THEN 'jpeg' WHEN 2 THEN 'gif'
      |            WHEN 3 THEN 'webp' WHEN 4 THEN 'bmp'
      |            WHEN 5 THEN 'tiff' ELSE 'pnm' END AS format,
      |       CAST(1 + doc_id % 640 AS BIGINT) AS width,
      |       CAST(1 + doc_id % 480 AS BIGINT) AS height
      |FROM documents ORDER BY doc_id""".stripMargin

  // closed-form expected sums. BMP/PNG/GIF/WebP rows: w=3+id%6, h=2+id%5;
  // over the w×h grid sum(x) = h*w*(w-1)/2 and sum(y) = w*h*(h-1)/2, so
  // e.g. sum_r = w*h*(id%97) + 3*sum(x) + 5*sum(y) (no mod wraparound by
  // construction; WebP is lossless so the same formula holds). JPEG rows
  // (fmt 3 = Huffman SOF0, fmt 5 = arithmetic SOF9 — same pixels, two
  // entropy spellings): wb×hb MCUs (wb=1+id%3, hb=1+id%2) of grayscale
  // constant per block v = br + 7·bx + 11·by, so each channel sums to
  // 64·(wb·hb·br + 7·hb·Σbx + 11·wb·Σby) — a decoder that misreads the
  // Huffman stream, the QM arithmetic stream, the DC prediction chain,
  // dequant, the IDCT, the MCU raster order, or the VP8L
  // prefix/transform layers hash-mismatches.
  val q47Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |         3 + doc_id % 6 AS w, 2 + doc_id % 5 AS h,
      |         1 + doc_id % 3 AS wb, 1 + doc_id % 2 AS hb,
      |         doc_id % 97 AS br, (doc_id * 3) % 89 AS bg,
      |         (doc_id * 7) % 83 AS bb,
      |         CAST(doc_id % 10 AS INT) AS fmt
      |  FROM documents),
      |j AS (
      |  SELECT doc_id,
      |         64 * (wb*hb*br + 7*(hb*(wb*(wb-1)//2)) + 11*(wb*(hb*(hb-1)//2)))
      |           AS jsum,
      |         16*(16*(hb*br + 11*(hb*(hb-1)//2)) + 6*(hb-1)) + 640*hb AS hsum,
      |         16*(16*hb)*br + 360*(16*hb) + 16*(16*hb)*(16*hb - 1) AS lsum,
      |         -- lossy VP8 slot: 16*hb x 16 grayscale, constant per 4x4
      |         -- block v = br + 7*bx + 11*by over (4*hb) x 4 blocks
      |         16*(16*hb*br + 28*((4*hb)*(4*hb-1)//2) + 264*hb) AS vsum
      |  FROM g),
      |-- CCITT G4 sub-slot: diagonal stripes, black iff (x+y+id)%3=0;
      |-- per row y the black count is (w - r + 2)//3 with
      |-- r = (3 - (y+id)%3)%3, white pixels contribute 255
      |ys AS (
      |  SELECT doc_id, w, h,
      |         unnest(generate_series(0, CAST(h - 1 AS BIGINT))) AS y
      |  FROM g),
      |g4 AS (
      |  SELECT doc_id,
      |         255 * (w*h - sum((w - (3 - (y + doc_id) % 3) % 3 + 2) // 3))
      |           AS gsum
      |  FROM ys GROUP BY doc_id, w, h)
      |SELECT g.doc_id,
      |       CASE WHEN g.fmt = 2 AND (g.doc_id // 10) % 2 = 1 THEN 'tiff'
      |            WHEN g.fmt = 2 THEN 'gif'
      |            WHEN g.fmt = 0 OR g.fmt = 8 THEN 'bmp'
      |            WHEN g.fmt = 1 AND (g.doc_id // 10) % 2 = 1 THEN 'pnm'
      |            WHEN g.fmt = 1 THEN 'png'
      |            WHEN g.fmt = 3 THEN 'jpeg'
      |            WHEN g.fmt = 4 AND (g.doc_id // 10) % 2 = 1
      |              THEN 'webp-vp8-unverified-probs'
      |            WHEN g.fmt = 4 THEN 'webp'
      |            ELSE 'jpeg' END AS decoder,
      |       CAST(CASE WHEN g.fmt IN (3, 5, 6) THEN 8*wb
      |            WHEN g.fmt = 9 THEN 16
      |            WHEN g.fmt = 4 AND (g.doc_id // 10) % 2 = 1 THEN 16*hb
      |            ELSE w END AS BIGINT) AS width,
      |       CAST(CASE WHEN g.fmt IN (3, 5, 6) THEN 8*hb
      |            WHEN g.fmt = 9 THEN 16*hb
      |            WHEN g.fmt = 4 AND (g.doc_id // 10) % 2 = 1 THEN 16
      |            ELSE h END AS BIGINT) AS height,
      |       CAST(CASE WHEN g.fmt IN (3, 5, 6) THEN jsum
      |            WHEN g.fmt = 9 THEN
      |         CASE WHEN (g.doc_id // 10) % 3 = 2 THEN lsum ELSE hsum END
      |            WHEN g.fmt = 4 AND (g.doc_id // 10) % 2 = 1 THEN vsum
      |            WHEN g.fmt = 2 AND (g.doc_id // 10) % 2 = 1
      |                 AND (g.doc_id // 20) % 4 = 3 THEN g4.gsum
      |            WHEN g.fmt = 2 AND (g.doc_id // 10) % 2 = 1
      |                 AND (g.doc_id // 20) % 4 = 0 AND (g.doc_id // 40) % 2 = 0
      |              THEN w*h*br -- JPEG-in-TIFF: single DC-only gray block
      |            ELSE
      |         w*h*br + 3*(h*w*(w-1)//2) + 5*(w*h*(h-1)//2) END AS BIGINT) AS sum_r,
      |       CAST(CASE WHEN g.fmt IN (3, 5, 6) THEN jsum
      |            WHEN g.fmt = 4 AND (g.doc_id // 10) % 2 = 1 THEN vsum
      |            WHEN g.fmt = 2 AND (g.doc_id // 10) % 2 = 1
      |                 AND (g.doc_id // 20) % 4 = 3 THEN g4.gsum
      |            WHEN g.fmt = 2 AND (g.doc_id // 10) % 2 = 1
      |                 AND (g.doc_id // 20) % 4 = 0 AND (g.doc_id // 40) % 2 = 0
      |              THEN w*h*br
      |            WHEN g.fmt IN (7, 9) THEN
      |         CASE WHEN g.fmt = 7 THEN
      |           -- Huffman-lossless shape 2 is 3-component RGB (real
      |           -- green channel); every other slot-7 shape is grayscale
      |           -- off the red formula
      |           CASE WHEN ((g.doc_id // 10) % 2 = 0 AND (g.doc_id // 20) % 4 = 2)
      |                  OR ((g.doc_id // 10) % 2 = 1 AND (g.doc_id // 20) % 4 = 3)
      |             THEN w*h*bg + 5*(h*w*(w-1)//2) + 2*(w*h*(h-1)//2)
      |             ELSE w*h*br + 3*(h*w*(w-1)//2) + 5*(w*h*(h-1)//2) END
      |         WHEN (g.doc_id // 10) % 3 = 2 THEN lsum ELSE hsum END
      |            ELSE
      |         w*h*bg + 5*(h*w*(w-1)//2) + 2*(w*h*(h-1)//2) END AS BIGINT) AS sum_g,
      |       CAST(CASE WHEN g.fmt IN (3, 5, 6) THEN jsum
      |            WHEN g.fmt = 4 AND (g.doc_id // 10) % 2 = 1 THEN vsum
      |            WHEN g.fmt = 2 AND (g.doc_id // 10) % 2 = 1
      |                 AND (g.doc_id // 20) % 4 = 3 THEN g4.gsum
      |            WHEN g.fmt = 2 AND (g.doc_id // 10) % 2 = 1
      |                 AND (g.doc_id // 20) % 4 = 0 AND (g.doc_id // 40) % 2 = 0
      |              THEN w*h*br
      |            WHEN g.fmt IN (7, 9) THEN
      |         CASE WHEN g.fmt = 7 THEN
      |           CASE WHEN ((g.doc_id // 10) % 2 = 0 AND (g.doc_id // 20) % 4 = 2)
      |                  OR ((g.doc_id // 10) % 2 = 1 AND (g.doc_id // 20) % 4 = 3)
      |             THEN w*h*bb + 2*(h*w*(w-1)//2) + 7*(w*h*(h-1)//2)
      |             ELSE w*h*br + 3*(h*w*(w-1)//2) + 5*(w*h*(h-1)//2) END
      |         WHEN (g.doc_id // 10) % 3 = 2 THEN lsum ELSE hsum END
      |            ELSE
      |         w*h*bb + 2*(h*w*(w-1)//2) + 7*(w*h*(h-1)//2) END AS BIGINT) AS sum_b
      |FROM g JOIN j ON g.doc_id = j.doc_id
      |JOIN g4 ON g.doc_id = g4.doc_id ORDER BY g.doc_id""".stripMargin

  // ------------------------------------------------------------- q51
  // End-to-end corpus preparation — the pipeline a training-data run
  // actually executes, composed from the library operators:
  //   1. quality gate (stopword-density/length score, q31's formula),
  //   2. language selection (labeled lang),
  //   3. near-dup removal among survivors (MinHash-LSH candidates +
  //      exact-Jaccard verify; greedy rule: drop the higher doc_id of
  //      each verified pair),
  //   4. token accounting for the kept set.
  // Every stage is deterministic, so the whole pipeline is one SQL oracle.
  def q51(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .withColumn("words", split(col("text"), " "))
      .withColumn("n_words", size(col("words")).cast("long"))
      .withColumn("n_stop",
        expr("size(filter(words, x -> x IN ('the', 'a')))").cast("long"))
      .withColumn("quality",
        least(lit(1.0), col("n_words") / lit(100.0))
          * (lit(1.0) - col("n_stop") * lit(1.0) / col("n_words")))
    val filtered = base
      .filter(col("lang") === "en" && col("quality") >= 0.3)
      .select("doc_id", "text", "n_words")
      // reused by the near-dup pipeline AND the final anti-join; persist
      // so the quality-scoring pass runs once
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dupB = graft.operators.NearDup
      .pairs(s, filtered, "doc_id", "text", shingleSize = 3, threshold = 0.8)
      .select(col("doc_b").as("doc_id")).distinct()
    filtered.join(dupB, Seq("doc_id"), "left_anti")
      .agg(count(lit(1)).as("docs_kept"),
        sum(col("n_words")).as("total_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  val q51Sql =
    """WITH base AS (
      |  SELECT doc_id, text, len(string_split(text, ' ')) AS n_words,
      |         least(1.0, len(string_split(text, ' ')) / 100.0)
      |           * (1.0 - len(list_filter(string_split(text, ' '), x -> x IN ('the', 'a'))) * 1.0
      |                    / len(string_split(text, ' '))) AS quality,
      |         lang
      |  FROM documents),
      |filtered AS (
      |  SELECT doc_id, text, n_words FROM base
      |  WHERE lang = 'en' AND quality >= 0.3),
      |words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      |  FROM filtered),
      |sh AS (
      |  SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY shingle IS NOT NULL),
      |ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |  FROM ds a JOIN ds b USING (shingle)
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
      |dup_b AS (
      |  SELECT DISTINCT doc_b AS doc_id FROM inter
      |  JOIN sizes sa ON sa.doc_id = doc_a
      |  JOIN sizes sb ON sb.doc_id = doc_b
      |  WHERE round(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.8)
      |SELECT count(*) AS docs_kept,
      |       CAST(sum(n_words) AS BIGINT) AS total_tokens,
      |       min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM filtered WHERE doc_id NOT IN (SELECT doc_id FROM dup_b)""".stripMargin

  // ------------------------------------------------------------- q56
  // N-gram Jaccard near-dup, EXACT variant: shingle inverted-index join
  // for candidates (shuffle keyed by shingle — never all-pairs), exact
  // array-intersect verification. Complements q35: same semantics, no
  // LSH approximation, full recall at any threshold — the lower 0.6
  // threshold here surfaces pairs LSH banding at b=32/r=4 would catch
  // only with p ≈ 0.99 rather than certainty.
  def q56(s: SparkSession, dir: String): DataFrame =
    graft.operators.NearDup.exactPairs(s, docs(s, dir), "doc_id", "text",
      shingleSize = 3, threshold = 0.6)

  val q56Sql =
    """WITH words AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS w,
      |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS pos
      |  FROM documents),
      |sh AS (
      |  SELECT doc_id, w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS shingle
      |  FROM words WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
      |  QUALIFY shingle IS NOT NULL),
      |ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY 1),
      |inter AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
      |  FROM ds a JOIN ds b USING (shingle)
      |  WHERE a.doc_id < b.doc_id GROUP BY 1, 2)
      |SELECT doc_a, doc_b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
      |FROM inter
      |JOIN sizes sa ON sa.doc_id = doc_a
      |JOIN sizes sb ON sb.doc_id = doc_b
      |WHERE round(c * 1.0 / (sa.n + sb.n - c), 4) >= 0.6
      |ORDER BY doc_a, doc_b""".stripMargin

  // ------------------------------------------------------------ registry
  // ------------------------------------------------------------- q70
  // Audio modality, same discipline as q47: REAL decode, no codec
  // library. The fixture writer emits actual audio bytes in SIX sample
  // codings — 16-bit PCM, IEEE-float32 AND (round 17) IEEE-float64
  // (identical sample values on the k/8388607 lattice),
  // G.711 µ-law (deterministic code bytes, oracle recomputes the
  // standard expansion), IMA ADPCM / MS ADPCM sub-rotation (rounds
  // 16/18; block-structured 4-bit codes whose blockwise-constant
  // fixtures reconstruct exactly), and FLAC (round 18; the pcm16 slot
  // sub-rotates into rice-coded fixed-order-2 subframes with mid/side
  // stereo — LOSSLESS, so the pcm16 closed forms carry over bit-exactly)
  // — deterministic per-channel ramps keyed by doc_id; every 7th doc is
  // a non-audio payload exercising the labeled stub fallback — and
  // [[graft.operators.AudioCodec]] walks the container and reconstructs
  // the interleaved samples. Features are exact integers — per-channel
  // sums and sums-of-squares, peak, integer-exact duration_us (sample
  // rates chosen to divide 1e6) — so the DuckDB oracle recomputes them
  // in closed form and a decoder that misreads the chunk walk, the
  // sample width, signedness, or channel interleave hash-mismatches.
  // Scale: decode is exchange-free mapPartitions, like the image path.
  def q70(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one-time fixture build, fingerprint-cached (see q47): the timed
    // query measures DECODE, not the fixture write
    val out70 = Tables.scratch(s"media70/${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    val mediaDir = Tables.cachedDerived(dir, out70,
      version = "v6-flac") {
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      ids.map { id =>
        val bytes =
          if (id % 7 == 3) // compressed-codec stand-in → labeled stub path
            ("ID3" + "not audio our codec can decode " * 3).getBytes("US-ASCII")
          else {
            // rates all divide 1e6 → duration_us is an exact integer
            val rate = (id % 3).toInt match {
              case 0 => 8000; case 1 => 10000; case _ => 20000
            }
            val n = 100 + (id % 50).toInt
            (id % 5).toInt match {
              case 2 =>
                // round 16: G.711 µ-law, mono — deterministic code bytes,
                // the oracle recomputes the standard segmented expansion
                // per sample
                graft.operators.AudioCodec.encodeWavUlaw(rate,
                  Array.tabulate[Byte](n)(i => ((id + 7L * i) % 256).toByte))
              case 4 =>
                // round 16: IMA ADPCM (wFormatTag 0x11), mono — the
                // first COMPRESSED audio coding. Blockwise-constant
                // input (block j holds v_j = a + 21j, a = -300 − id%40)
                // encodes to header-predictor v_j + all-zero nibbles at
                // step index 0, which reconstructs EXACTLY — so sums/
                // sumsq/peak keep closed forms while the decoder walks
                // real block headers, nibble groups, and spb accounting.
                // Round 18 sub-rotates MICROSOFT ADPCM (wFormatTag 2):
                // the second-order-predictor coding, same blockwise-
                // constant exactness (both header seed samples carry
                // v_j verbatim; zero nibbles predict v_j forever), spb
                // 12 at blockAlign 12 mono
                val nb = 4 + (id % 3).toInt
                val a = -300 - (id % 40).toInt
                if ((id / 5) % 2 == 1)
                  graft.operators.AudioCodec.encodeWavMsAdpcm(rate, 1,
                    Array.tabulate(nb * 12)(k => a + 21 * (k / 12)),
                    blockAlign = 12)
                else
                  graft.operators.AudioCodec.encodeWavAdpcm(rate, 1,
                    Array.tabulate(nb * 17)(k => a + 21 * (k / 17)),
                    blockAlign = 12)
              case slot =>
                val ch = 1 + (id % 2).toInt
                // channel c, frame i → -500 + 7c + 13i (monotone ramp:
                // peak and the channel sums have closed forms;
                // |v| ≤ 1444 « 2^15)
                val samples = Array.tabulate(n * ch) { k =>
                  -500 + 7 * (k % ch) + 13 * (k / ch)
                }
                if (slot == 1)
                  // round 16: IEEE-float container, SAME sample values —
                  // k/8388607 lattice floats decode back to exactly k,
                  // so every closed form is shared with the pcm16 rows
                  graft.operators.AudioCodec.encodeWavFloat(rate, ch,
                    samples.map(v => (v.toDouble / 8388607.0).toFloat))
                else if (slot == 3)
                  // round 17: 64-bit IEEE-float container (wFormatTag 3,
                  // bits=64) — same lattice mapping, same closed forms
                  graft.operators.AudioCodec.encodeWavFloat64(rate, ch,
                    samples.map(v => v.toDouble / 8388607.0))
                else if ((id / 5) % 2 == 1)
                  // round 18: FLAC, SAME sample values — LOSSLESS, so
                  // every closed form is shared with the pcm16 rows
                  // while the decoder walks real rice-coded fixed-order-2
                  // subframes, CRC-8/16 checks, and (stereo docs)
                  // mid/side decorrelation
                  graft.operators.FlacCodec.encodeFlac(rate, ch, 16,
                    samples, blockSize = 64, spelling = "fixed2",
                    stereo = if (ch == 2) "ms" else "independent")
                else graft.operators.AudioCodec.encodeWav(rate, ch, samples)
            }
          }
        (id, bytes)
      }.toDF("doc_id", "content")
        .write.mode("overwrite").parquet(s"$out70/data")
    }
    graft.operators.Multimodal
      .extractAudioFeatures(s.read.parquet(s"$mediaDir/data"))
      .select("doc_id", "decoder", "sample_rate", "channels", "n_frames",
        "duration_us", "peak_abs", "sum_ch0", "sum_ch1", "sumsq_ch0",
        "sumsq_ch1")
      .orderBy("doc_id")
  }

  // closed forms over the ramp v(c,i) = a_c + 13i with a_c = -500 + 7c:
  // sum_c  = n·a_c + 13·S1,            S1 = n(n-1)/2
  // ssq_c  = n·a_c² + 26·a_c·S1 + 169·S2,  S2 = (n-1)n(2n-1)/6
  // peak   = max(|a_0|, a_{ch-1} + 13(n-1)) = max(500, 7(ch-1)+13(n-1)-500)
  // µ-law rows (slot 2): the oracle recomputes the G.711 expansion per
  // sample — uu = 255−code, t = ((uu%16)·8+132)·2^((uu/16)%8), value =
  // sign(uu≥128) ? 132−t : t−132 — and aggregates; a decoder whose
  // segment/bias/sign arithmetic is off by anything hash-mismatches.
  // Float rows (slot 1) share every closed form with pcm16: the fixture
  // floats are k/8388607 lattice points that decode back to exactly k.
  // ADPCM rows (slot 4): nb blocks of spb samples (spb 17 IMA / 12
  // MS-ADPCM, sub-rotated by (id/5)%2), block j constant v_j = a + 21j
  // (all negative) — the header seed sample(s) + all-zero nibbles
  // reconstruct exactly in both codings, so sum = spb·(nb·a + 21·S1(nb)),
  // ssq = spb·(nb·a² + 42·a·S1 + 441·S2), peak = −a.
  val q70Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |         CASE CAST(doc_id % 3 AS INT)
      |           WHEN 0 THEN 8000 WHEN 1 THEN 10000 ELSE 20000 END AS rate,
      |         CASE WHEN doc_id % 5 IN (2, 4) THEN 1
      |              ELSE 1 + doc_id % 2 END AS ch,
      |         CASE WHEN doc_id % 5 = 4 AND (doc_id // 5) % 2 = 1 THEN 12
      |              ELSE 17 END AS spb,
      |         CASE WHEN doc_id % 5 = 4 THEN
      |           (CASE WHEN (doc_id // 5) % 2 = 1 THEN 12 ELSE 17 END)
      |             * (4 + doc_id % 3)
      |              ELSE 100 + doc_id % 50 END AS n,
      |         4 + doc_id % 3 AS nb,
      |         -300 - doc_id % 40 AS a,
      |         doc_id % 7 = 3 AS stub,
      |         CAST(doc_id % 5 AS INT) AS slot
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, rate, ch, n, nb, a, stub, slot, spb,
      |         n*(n-1)//2 AS s1, (n-1)*n*(2*n-1)//6 AS s2,
      |         nb*(nb-1)//2 AS s1b, (nb-1)*nb*(2*nb-1)//6 AS s2b
      |  FROM g),
      |uv AS (
      |  SELECT doc_id, 255 - CAST((doc_id + 7*i) % 256 AS INT) AS uu
      |  FROM (SELECT doc_id, unnest(range(CAST(n AS BIGINT))) AS i
      |        FROM f WHERE NOT stub AND slot = 2)),
      |ue AS (
      |  SELECT doc_id,
      |         CASE WHEN uu >= 128
      |           THEN 132 - ((uu % 16)*8 + 132) * CAST(POW(2, (uu // 16) % 8) AS BIGINT)
      |           ELSE ((uu % 16)*8 + 132) * CAST(POW(2, (uu // 16) % 8) AS BIGINT) - 132
      |         END AS v
      |  FROM uv),
      |ua AS (
      |  SELECT doc_id, sum(v) AS us, sum(v*v) AS usq, max(abs(v)) AS upk
      |  FROM ue GROUP BY 1)
      |SELECT f.doc_id,
      |       CASE WHEN stub THEN 'stub'
      |            WHEN slot = 1 THEN 'pcmf32'
      |            WHEN slot = 3 THEN 'pcmf64'
      |            WHEN slot = 2 THEN 'ulaw'
      |            WHEN slot = 4 AND (f.doc_id // 5) % 2 = 1 THEN 'msadpcm'
      |            WHEN slot = 4 THEN 'adpcm'
      |            WHEN slot = 0 AND (f.doc_id // 5) % 2 = 1 THEN 'flac'
      |            ELSE 'pcm16' END AS decoder,
      |       CAST(CASE WHEN stub THEN NULL ELSE rate END AS BIGINT) AS sample_rate,
      |       CAST(CASE WHEN stub THEN NULL ELSE ch END AS BIGINT) AS channels,
      |       CAST(CASE WHEN stub THEN NULL ELSE n END AS BIGINT) AS n_frames,
      |       CAST(CASE WHEN stub THEN NULL
      |            ELSE n * (1000000 // rate) END AS BIGINT) AS duration_us,
      |       CAST(CASE WHEN stub THEN NULL
      |            WHEN slot = 2 THEN upk
      |            WHEN slot = 4 THEN -a
      |            ELSE GREATEST(500, 7*(ch-1) + 13*(n-1) - 500) END AS BIGINT) AS peak_abs,
      |       CAST(CASE WHEN stub THEN NULL
      |            WHEN slot = 2 THEN us
      |            WHEN slot = 4 THEN spb*(nb*a + 21*s1b)
      |            ELSE n*(-500) + 13*s1 END AS BIGINT) AS sum_ch0,
      |       CAST(CASE WHEN stub OR ch = 1 THEN NULL
      |            ELSE n*(-493) + 13*s1 END AS BIGINT) AS sum_ch1,
      |       CAST(CASE WHEN stub THEN NULL
      |            WHEN slot = 2 THEN usq
      |            WHEN slot = 4 THEN spb*(nb*a*a + 42*a*s1b + 441*s2b)
      |            ELSE n*250000 + 26*(-500)*s1 + 169*s2 END AS BIGINT) AS sumsq_ch0,
      |       CAST(CASE WHEN stub OR ch = 1 THEN NULL
      |            ELSE n*243049 + 26*(-493)*s1 + 169*s2 END AS BIGINT) AS sumsq_ch1
      |FROM f LEFT JOIN ua ON f.doc_id = ua.doc_id
      |ORDER BY f.doc_id""".stripMargin

  // ------------------------------------------------------------- q71
  // Video modality: REAL container decode + first-class frame SAMPLING,
  // over FOUR codec families. Even docs carry actual AVI bytes (RIFF
  // hdrl/strl/movi/idx1 tree, uncompressed 24bpp DIB frames); odd docs
  // carry actual animated GIFs (GCE + per-frame local color tables +
  // LZW pixel streams — [[graft.operators.VideoCodec]]); both use the
  // same per-frame gradient keyed by (doc_id, frame); doc_id%10=3 docs
  // are COMPOSITED GIFs (partial frames over a maintained canvas — the
  // GIF89a disposal/placement semantics rendering for real);
  // doc_id%10=6 docs are MOTION-JPEG AVIs (round 16: the first
  // COMPRESSED video codec — each frame chunk is a complete JPEG
  // decoded by the in-repo T.81 codec, block-constant grayscale so the
  // round trip is bit-exact and the sums stay closed-form); and every
  // doc_id%10=1 docs are MICROSOFT-RLE AVIs (round 16: the DELTA-frame
  // compressed codec — RLE8 streams whose cursor deltas leave skipped
  // pixels showing the previous frame, sharing the composited-GIF
  // accumulated-canvas closed form); doc_id%10=8 docs are ANIMATED
  // WEBPs (round 18: VP8X/ANIM/ANMF compositing — lossless VP8L
  // sub-frames alpha-blended onto a maintained canvas at even ANMF
  // offsets, same accumulated-canvas closed form); and every
  // 5th doc is a non-video payload exercising the labeled stub row. The
  // operator samples every 2nd frame and computes exact channel sums
  // off the decoded pixels, so the DuckDB oracle recomputes each
  // sampled frame's sums in closed form — a decoder that misreads the
  // LIST tree, the DIB row order/stride, BGR, the GIF block walk, the
  // LZW stream, or the sampling arithmetic hash-mismatches. Scale: one
  // clip at a time per executor thread, only sampled frames
  // materialized (GIF skips non-sampled frames at the container level,
  // no LZW work), no shuffle.
  def q71(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one-time fixture build, fingerprint-cached (see q47): the timed
    // query measures DECODE + sampling, not the fixture write
    val out71 = Tables.scratch(s"media71/${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    val mediaDir = Tables.cachedDerived(dir, out71,
      version = "v6-webp-anim") {
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      ids.map { id =>
        val nf = 3 + (id % 4).toInt
        val br = (id % 80).toInt
        val bg = ((id * 3) % 70).toInt
        val bb = ((id * 7) % 60).toInt
        val bytes =
          if (id % 5 == 4) // compressed-codec stand-in → labeled stub row
            ("MOOV not a container we decode " * 3).getBytes("US-ASCII")
          else if (id % 10 == 3) {
            // COMPOSITED animated GIF (round 16): an 8×4 static base
            // canvas, then one 1×1 overlay per subsequent frame at
            // (j−1, 2) painting base+Δ (Δ = 40/50/60), disposal 1 —
            // sampled frame f shows EXACTLY f overlays, so each channel
            // sum is the base-canvas closed form plus Δ·f. Positions are
            // distinct (nf ≤ 6 < canvas width), so no repaint ambiguity;
            // max channel 79+21+15+40 = 155 < 255
            import graft.operators.VideoCodec.GifFrame
            def base(x: Int, y: Int): (Int, Int, Int) =
              (br + 3 * x + 5 * y, bg + 5 * x + 2 * y, bb + 2 * x + 7 * y)
            val frames = GifFrame(0, 0, 8, 4, 1, (x, y) => base(x, y)) +:
              (1 until nf).map { j =>
                val (r0, g0, b0) = base(j - 1, 2)
                GifFrame(j - 1, 2, 1, 1, 1,
                  (_, _) => (r0 + 40, g0 + 50, b0 + 60))
              }
            graft.operators.VideoCodec.encodeGifAnimComposited(8, 4, frames)
          } else if (id % 10 == 1) {
            // Microsoft-RLE AVI (round 16): the DELTA-frame compressed
            // codec — frame 0 paints the full 8×4 base canvas, frame
            // j ≥ 1 paints a single-cell overlay at (j−1, 2) of
            // base+Δ (Δ = 40/50/60) through real RLE8 cursor deltas;
            // every skipped pixel shows the previous frame through, so
            // the closed form is the SAME accumulated-canvas arithmetic
            // as the composited-GIF slot (sampled frame f sums to the
            // base closed form plus Δ·f)
            import graft.operators.VideoCodec.MrleFrame
            def base(x: Int, y: Int): (Int, Int, Int) =
              (br + 3 * x + 5 * y, bg + 5 * x + 2 * y, bb + 2 * x + 7 * y)
            val pal = Array.tabulate(32) { k =>
              val (r, g, bl) = base(k % 8, k / 8)
              (r << 16) | (g << 8) | bl
            } ++ (1 until nf).map { j =>
              val (r0, g0, b0) = base(j - 1, 2)
              ((r0 + 40) << 16) | ((g0 + 50) << 8) | (b0 + 60)
            }
            val frames = MrleFrame(0, 0, 8, 4, (x, y) => y * 8 + x) +:
              (1 until nf).map(j => MrleFrame(j - 1, 2, 1, 1, (_, _) => 31 + j))
            graft.operators.VideoCodec.encodeAviMrle(8, 4, frames, pal)
          } else if (id % 10 == 8) {
            // ANIMATED WEBP (round 18): a 12×4 VP8L base frame, then one
            // opaque 1×1 VP8L overlay per subsequent frame at the EVEN
            // offset (2(j−1), 2) — ANMF stores x/2 — painting base+Δ
            // (Δ = 40/50/60) under alpha-blend (opaque ⇒ exact), so the
            // closed form is the SAME accumulated-canvas arithmetic as
            // the composited-GIF and MRLE slots: sampled frame f sums to
            // the 12×4 base plus Δ·f. Positions 0,2,4,6,8 are distinct
            // (nf ≤ 6), no repaint ambiguity; max channel
            // 79+33+15+60 = 187 < 255
            import graft.operators.VideoCodec.WebpFrame
            def base(x: Int, y: Int): Int =
              0xff000000 | ((br + 3 * x + 5 * y) << 16) |
                ((bg + 5 * x + 2 * y) << 8) | (bb + 2 * x + 7 * y)
            val frames = WebpFrame(0, 0, 12, 4, argb = (x, y) => base(x, y)) +:
              (1 until nf).map { j =>
                val p = base(2 * (j - 1), 2)
                WebpFrame(2 * (j - 1), 2, 1, 1, argb = (_, _) =>
                  p + (40 << 16) + (50 << 8) + 60)
              }
            graft.operators.VideoCodec.encodeWebpAnim(12, 4, frames)
          } else if (id % 10 == 6) {
            // MOTION-JPEG AVI (round 16: the first compressed video
            // codec): 16×8 grayscale frames, constant per 8×8 block
            // (v = br + 9f + 11·⌊x/8⌋) — block-constant + all-ones
            // quant = bit-exact round-trip (JpegCodec object doc), so
            // each channel sum has the closed form 128·(br+9f) + 704;
            // max value 79+45+11 = 135 < 255
            graft.operators.VideoCodec.encodeAviMjpeg(16, 8, nf,
              (f, x, _) => {
                val v = br + 9 * f + 11 * (x / 8)
                (v, v, v)
              }, gray = true)
          } else {
            val w = 4 + (id % 3).toInt
            val h = 3 + (id % 2).toInt
            // frame f gradient: base walks 9/6/4 per frame; max channel
            // value 79+45+15+15 = 154 < 255 → closed-form sums exact
            val px = (f: Int, x: Int, y: Int) =>
              (br + 9 * f + 3 * x + 5 * y,
               bg + 6 * f + 5 * x + 2 * y,
               bb + 4 * f + 2 * x + 7 * y)
            if (id % 2 == 0) graft.operators.VideoCodec.encodeAvi(w, h, nf, px)
            else graft.operators.VideoCodec.encodeGifAnim(w, h, nf, px)
          }
        (id, bytes)
      }.toDF("doc_id", "content")
        .write.mode("overwrite").parquet(s"$out71/data")
    }
    graft.operators.Multimodal
      .sampleVideoFrames(s.read.parquet(s"$mediaDir/data"), stride = 2)
      .orderBy("doc_id", "frame_idx")
  }

  // closed forms per sampled frame f ∈ {0,2,4} ∩ [0,nf): over the w×h
  // grid Sx = h·w(w-1)/2, Sy = w·h(h-1)/2, so
  // sum_r = w·h·(br+9f) + 3·Sx + 5·Sy (and per-channel analogues).
  // Composited docs (doc_id%10=3) are fixed 8×4: the base canvas sum
  // plus Δ·f from the f overlays painted so far (Δ = 40/50/60) — the
  // oracle that breaks if disposal/placement/transparency compositing
  // renders anything but the accumulated canvas.
  val q71Sql =
    """WITH g AS (
      |  SELECT doc_id, 3 + doc_id % 4 AS nf,
      |         CASE WHEN doc_id % 10 IN (1, 3) THEN 8
      |              WHEN doc_id % 10 = 8 THEN 12
      |              WHEN doc_id % 10 = 6 THEN 16
      |              ELSE 4 + doc_id % 3 END AS w,
      |         CASE WHEN doc_id % 10 IN (1, 3, 8) THEN 4
      |              WHEN doc_id % 10 = 6 THEN 8
      |              ELSE 3 + doc_id % 2 END AS h,
      |         doc_id % 80 AS br, (doc_id * 3) % 70 AS bg,
      |         (doc_id * 7) % 60 AS bb
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, nf, w, h, br, bg, bb,
      |         h*(w*(w-1)//2) AS sx, w*(h*(h-1)//2) AS sy,
      |         unnest(generate_series(0, CAST(nf - 1 AS BIGINT), 2)) AS f
      |  FROM g WHERE doc_id % 5 <> 4)
      |SELECT doc_id,
      |       CASE WHEN doc_id % 10 = 1 THEN 'mrle'
      |            WHEN doc_id % 10 = 6 THEN 'mjpg'
      |            WHEN doc_id % 10 = 8 THEN 'webp'
      |            WHEN doc_id % 2 = 0 THEN 'dib' ELSE 'gif' END AS decoder,
      |       CAST(nf AS BIGINT) AS total_frames, CAST(f AS BIGINT) AS frame_idx,
      |       CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
      |       CAST(CASE WHEN doc_id % 10 IN (1, 3, 8)
      |            THEN w*h*br + 3*sx + 5*sy + 40*f
      |            WHEN doc_id % 10 = 6
      |            THEN 128*(br + 9*f) + 704
      |            ELSE w*h*(br + 9*f) + 3*sx + 5*sy END AS BIGINT) AS sum_r,
      |       CAST(CASE WHEN doc_id % 10 IN (1, 3, 8)
      |            THEN w*h*bg + 5*sx + 2*sy + 50*f
      |            WHEN doc_id % 10 = 6
      |            THEN 128*(br + 9*f) + 704
      |            ELSE w*h*(bg + 6*f) + 5*sx + 2*sy END AS BIGINT) AS sum_g,
      |       CAST(CASE WHEN doc_id % 10 IN (1, 3, 8)
      |            THEN w*h*bb + 2*sx + 7*sy + 60*f
      |            WHEN doc_id % 10 = 6
      |            THEN 128*(br + 9*f) + 704
      |            ELSE w*h*(bb + 4*f) + 2*sx + 7*sy END AS BIGINT) AS sum_b
      |FROM fr
      |UNION ALL
      |SELECT doc_id, 'stub', NULL, NULL, NULL, NULL, NULL, NULL, NULL
      |FROM g WHERE doc_id % 5 = 4
      |ORDER BY doc_id, frame_idx""".stripMargin

  // ------------------------------------------------------------- q72
  // The "resize" verb of the multimodal contract: decode → exact 2× box
  // downscale → re-encode as real PNG, exchange-free. Fixtures rotate
  // the four LOSSLESS container formats (BMP/PNG/GIF/WebP-VP8L) with
  // even-dimension gradients, so every 2×2 block is full and the
  // truncating integer mean has a closed form the DuckDB oracle
  // recomputes: slopes (3,5)/(5,2)/(2,7) per input axis become
  // (6,10)/(10,4)/(4,14) per output axis with constant rounding offsets
  // (+4/+3/+4). A resampler that misweights the box, mixes rows, or
  // rounds differently hash-mismatches. Every 7th doc is a non-image
  // payload exercising the labeled stub row.
  def q72(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out72 = Tables.scratch(s"media72/${dir.replaceAll("[^a-zA-Z0-9]", "_")}")
    val mediaDir = Tables.cachedDerived(dir, out72, version = "v4-tiff") {
      val ids = docs(s, dir).select(col("doc_id").cast("long")).as[Long]
      ids.map { id =>
        val bytes =
          if (id % 7 == 5) "not an image at all".getBytes("US-ASCII")
          else {
            val w = 4 + 2 * (id % 3).toInt
            val h = 2 + 2 * (id % 2).toInt
            val br = (id % 97).toInt
            val bg = ((id * 3) % 89).toInt
            val bb = ((id * 7) % 83).toInt
            def px(x: Int, y: Int): (Int, Int, Int) =
              (br + 3 * x + 5 * y, bg + 5 * x + 2 * y, bb + 2 * x + 7 * y)
            (id % 5).toInt match {
              case 0 => graft.operators.PixelCodec.encodeBmp(w, h, px,
                topDown = (id / 5) % 2 == 1)
              case 1 => graft.operators.PixelCodec.encodePng(w, h, px,
                interlaced = (id / 5) % 2 == 1)
              case 2 =>
                // round 18: sub-rotates baseline TIFF (LZW) — lossless,
                // so the resize closed form is shared with the GIF half
                if ((id / 5) % 2 == 1)
                  graft.operators.TiffCodec.encodeTiffRgb(w, h, px, "lzw")
                else graft.operators.PixelCodec.encodeGif(w, h, px)
              case 3 =>
                // sub-rotates LOSSY VP8 (round 18) every third cycle:
                // 16×16 grayscale constant per 4×4 block decodes exactly
                // (Vp8Codec), and each 2×2 resize box falls inside one
                // block, so the downscale is exact too: out 8×8, every
                // channel sum = 4·Σ_blocks v = 64·br + 1728
                if ((id / 5) % 3 == 2)
                  graft.operators.Vp8Codec.encodeWebpLossyGray(16, 16,
                    (bx4, by4) => br + 7 * bx4 + 11 * by4)
                else graft.operators.WebpCodec.encodeWebpLossless(w, h, px,
                  subtractGreen = (id / 5) % 2 == 1)
              case _ => // round 16: BI_RLE8 run-length BMP, lossless too
                graft.operators.PixelCodec.encodeBmpRle8(w, h,
                  Array.tabulate(w * h) { k =>
                    val (r, g, bl) = px(k % w, k / w)
                    (r << 16) | (g << 8) | bl
                  },
                  (x, y) => y * w + x)
            }
          }
        (id, bytes)
      }.toDF("doc_id", "content")
        .write.mode("overwrite").parquet(s"$out72/data")
    }
    graft.operators.Multimodal
      .resizeImages(s.read.parquet(s"$mediaDir/data"))
      .select("doc_id", "decoder", "in_width", "in_height",
        "out_width", "out_height", "sum_r", "sum_g", "sum_b")
      .orderBy("doc_id")
  }

  // closed forms: ow=2+id%3, oh=1+id%2; Si = oh·ow(ow-1)/2,
  // Sj = ow·oh(oh-1)/2; resized channel bases gain the truncating
  // rounding offsets derived above
  val q72Sql =
    """WITH g AS (
      |  SELECT doc_id,
      |         4 + 2*(doc_id % 3) AS w, 2 + 2*(doc_id % 2) AS h,
      |         2 + doc_id % 3 AS ow, 1 + doc_id % 2 AS oh,
      |         doc_id % 97 AS br, (doc_id * 3) % 89 AS bg,
      |         (doc_id * 7) % 83 AS bb,
      |         doc_id % 7 = 5 AS stub,
      |         doc_id % 5 = 3 AND (doc_id // 5) % 3 = 2 AS vp8lossy
      |  FROM documents),
      |f AS (
      |  SELECT doc_id, w, h, ow, oh, br, bg, bb, stub, vp8lossy,
      |         oh*(ow*(ow-1)//2) AS si, ow*(oh*(oh-1)//2) AS sj
      |  FROM g)
      |SELECT doc_id,
      |       CASE WHEN stub THEN 'stub'
      |            WHEN doc_id % 5 IN (0, 4) THEN 'bmp'
      |            WHEN doc_id % 5 = 1 THEN 'png'
      |            WHEN doc_id % 5 = 2 AND (doc_id // 5) % 2 = 1 THEN 'tiff'
      |            WHEN doc_id % 5 = 2 THEN 'gif'
      |            WHEN vp8lossy THEN 'webp-vp8-unverified-probs'
      |            ELSE 'webp' END AS decoder,
      |       CAST(CASE WHEN stub THEN NULL WHEN vp8lossy THEN 16 ELSE w END AS BIGINT) AS in_width,
      |       CAST(CASE WHEN stub THEN NULL WHEN vp8lossy THEN 16 ELSE h END AS BIGINT) AS in_height,
      |       CAST(CASE WHEN stub THEN NULL WHEN vp8lossy THEN 8 ELSE ow END AS BIGINT) AS out_width,
      |       CAST(CASE WHEN stub THEN NULL WHEN vp8lossy THEN 8 ELSE oh END AS BIGINT) AS out_height,
      |       CAST(CASE WHEN stub THEN NULL
      |            WHEN vp8lossy THEN 64*br + 1728
      |            ELSE ow*oh*(br+4) + 6*si + 10*sj END AS BIGINT) AS sum_r,
      |       CAST(CASE WHEN stub THEN NULL
      |            WHEN vp8lossy THEN 64*br + 1728
      |            ELSE ow*oh*(bg+3) + 10*si + 4*sj END AS BIGINT) AS sum_g,
      |       CAST(CASE WHEN stub THEN NULL
      |            WHEN vp8lossy THEN 64*br + 1728
      |            ELSE ow*oh*(bb+4) + 4*si + 14*sj END AS BIGINT) AS sum_b
      |FROM f ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q72_image_resize" -> (q72 _),
    "q71_video_frames" -> (q71 _),
    "q70_audio_features" -> (q70 _),
    "q56_ngram_jaccard" -> (q56 _),
    "q51_corpus_prep" -> (q51 _),
    "q50_ann_ivf" -> (q50 _),
    "q50b_ann_ivfpq" -> (q50b _),
    "q47_multimodal_features" -> (q47 _),
    "q30_dedup_exact" -> (q30 _),
    "q31_text_stats" -> (q31 _),
    "q32_lang_id" -> (q32 _),
    "q33_token_count" -> (q33 _),
    "q34_fingerprint" -> (q34 _),
    "q35_minhash_neardup" -> (q35 _),
    "q36_simhash" -> (q36 _),
    "q37_ann_topk" -> (q37 _),
    "q38_ann_lsh" -> (q38 _),
    "q39_embedding_neardup" -> (q39 _),
    "q40_multimodal_meta" -> (q40 _),
    "q66_image_meta" -> (q66 _))

  val oracle: Map[String, String] = Map(
    "q72_image_resize" -> q72Sql,
    "q71_video_frames" -> q71Sql,
    "q70_audio_features" -> q70Sql,
    "q56_ngram_jaccard" -> q56Sql,
    "q51_corpus_prep" -> q51Sql,
    "q47_multimodal_features" -> q47Sql,
    "q30_dedup_exact" -> q30Sql,
    "q31_text_stats" -> q31Sql,
    "q32_lang_id" -> q32Sql,
    "q33_token_count" -> q33Sql,
    "q34_fingerprint" -> q34Sql,
    "q35_minhash_neardup" -> q35Sql,
    "q36_simhash" -> q36Sql,
    "q37_ann_topk" -> q37Sql,
    "q38_ann_lsh" -> q38Sql,
    "q50_ann_ivf" -> q50Sql,
    "q50b_ann_ivfpq" -> q50bSql,
    "q39_embedding_neardup" -> q39Sql,
    "q40_multimodal_meta" -> q40Sql,
    "q66_image_meta" -> q66Sql)
}
