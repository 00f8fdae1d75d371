package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class NearDupSpec extends SparkFunSuite {
  import spark.implicits._

  private def docs = graft.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), col("text"))

  test("exactPairs matches naive all-pairs Jaccard on the documents corpus") {
    val got = NearDup.exactPairs(spark, docs, "doc_id", "text")
      .as[(Long, Long, Double)].collect().toSet
    // naive oracle: every pair, exact Jaccard over the same shingle sets
    val sh = NearDup.shingles(docs, "doc_id", "text")
    val expected = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.shingles"), col("b.shingles"))))
      .withColumn("uni",
        size(col("a.shingles")) + size(col("b.shingles")) - col("inter"))
      .withColumn("jaccard", round(col("inter") * lit(1.0) / col("uni"), 4))
      .filter(col("jaccard") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"), col("jaccard"))
      .as[(Long, Long, Double)].collect().toSet
    assert(got == expected)
    assert(got.nonEmpty) // corpus has seeded near-dups; an empty pass proves nothing
  }

  test("PPJoin length filter prunes hopeless-size candidates, loses no pair") {
    // doc 1 is a short header; doc 2 = header + boilerplate body; docs
    // 3-5 share the body. The header shingles are the CORPUS-rarest
    // (df=2), so they sit in both doc 1's and doc 2's prefix and the
    // prefix filter alone emits the (1,2) candidate — whose size ratio
    // 4/18 can never reach Jaccard 0.8. Only the length filter kills it.
    val e = (1 to 14).map(i => s"e$i").mkString(" ")
    val corpus = Seq(
      (1L, "s1 s2 s3 s4 s5 s6"),
      (2L, s"s1 s2 s3 s4 s5 s6 $e"),
      (3L, s"$e z1 z2"),
      (4L, s"$e z1 z2"),
      (5L, s"$e z3 z4")).toDF("doc_id", "text")
    val sh = NearDup.shingles(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val filtered = NearDup.exactCandidates(sh, 0.8)
      .as[(Long, Long)].collect().toSet
    // naive inverted-index candidates (no prefix, no length filter)
    val tokens = sh.select(col("doc_id"), explode(col("shingles")).as("shingle"))
    val naive = tokens.as("a").join(tokens.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(naive.contains((1L, 2L))) // the hopeless-ratio pair exists upstream
    assert(!filtered.contains((1L, 2L)), "length filter must kill the 4-vs-18 pair")
    assert(filtered.subsetOf(naive))
    // exactness: verification over the reduced candidates finds the same
    // qualifying pairs as over the naive set — nothing was lost
    val got = NearDup.verify(filtered.toSeq.toDF("doc_a", "doc_b"), sh, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = NearDup.verify(naive.toSeq.toDF("doc_a", "doc_b"), sh, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == expected)
    assert(got == Set((3L, 4L))) // the identical-body pair survives end to end
    sh.unpersist()
  }

  test("hot-token path is exact: hotDf=1 routes EVERY pair through the histogram bound") {
    // df > 1 for every token any two docs share, so with hotDf = 1 the
    // cold join can emit nothing — all candidates must survive the
    // overlap_bound filter. Equality with the naive all-pairs oracle
    // proves the bound never drops a qualifying pair.
    val sh = NearDup.shingles(docs, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val viaHot = NearDup.verify(NearDup.exactCandidates(sh, 0.8, hotDf = 1), sh, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.shingles"), col("b.shingles"))))
      .withColumn("uni",
        size(col("a.shingles")) + size(col("b.shingles")) - col("inter"))
      .filter(col("inter") * lit(1.0) / col("uni") >= 0.8 - 1e-9)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
    assert(viaHot == expected)
    assert(viaHot.nonEmpty)
    sh.unpersist()
  }

  test("histogram bound prunes dissimilar docs sharing only a hot token") {
    // docs 1-8 all contain the shingle "x1 x2 x3" (df=8 > hotDf=2) but are
    // otherwise disjoint; docs 7 and 8 are identical. The hot join's
    // overlap_bound must kill the 1-vs-2..6 template pairs BEFORE the
    // distinct shuffle while keeping the true (7,8) pair.
    val mk = (i: Int) => s"x1 x2 x3 " + (1 to 12).map(j => s"w${i}_$j").mkString(" ")
    val corpus = ((1 to 6).map(i => (i.toLong, mk(i))) ++
      Seq((7L, mk(7)), (8L, mk(7)))).toDF("doc_id", "text")
    val sh = NearDup.shingles(corpus, "doc_id", "text")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cands = NearDup.exactCandidates(sh, 0.8, hotDf = 2)
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((7L, 8L)), "true duplicate pair must survive")
    assert(!cands.exists(p => p._1 <= 6 && p._2 <= 6),
      s"template-only pairs must die at the histogram bound, got $cands")
    sh.unpersist()
  }

  test("oversized docs (no byte sketch) still pair exactly via the null-sketch pass-through") {
    // 300 words → 298 shingles > 255: the byte histogram cannot count
    // them, so token_histogram yields NULL and the hot join's
    // coalesce(..., true) must route the pair to exact verification
    // instead of silently dropping it (a clamped sketch would reject:
    // Σmin ≤ 256·255 can sit below α for big docs)
    val words = (1 to 300).map(i => s"w$i").mkString(" ")
    val corpus = Seq((1L, words), (2L, words)).toDF("doc_id", "text")
    val sh = NearDup.shingles(corpus, "doc_id", "text")
      .withColumn("shingles", expr("hash64_sorted(shingles)"))
    val got = NearDup.verify(NearDup.exactCandidates(sh, 0.8, hotDf = 1), sh, 0.8)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)),
      s"oversized identical docs must survive the hot path, got $got")
  }

  test("token_histogram/overlap_bound kernel: Σmin upper-bounds the true intersection") {
    graft.functions.Registry.install(spark)
    val rows = spark.sql(
      """SELECT overlap_bound(token_histogram(array('a','b','c','d'), 8),
        |                     token_histogram(array('c','d','e'), 8)) AS bound,
        |       overlap_bound(token_histogram(array('a','b'), 8),
        |                     token_histogram(array('x','y'), 8)) AS disjoint
        |""".stripMargin).head()
    assert(rows.getInt(0) >= 2) // true overlap {c,d} = 2; bound can exceed, never undercut
    assert(rows.getInt(1) <= 2 && rows.getInt(1) >= 0)
  }

  test("length filter keeps FP-borderline pairs (0.8 of 35 is not 29)") {
    // |a| = 28, |b| = 35: 0.8·35 = 28.000000000000004 in IEEE double —
    // a ceil-based filter would wrongly reject this exact-boundary pair
    val a = (1 to 29).map(i => s"t$i").mkString(" ") // 28 2-shingles
    val b = (1 to 36).map(i => s"t$i").mkString(" ") // 35 2-shingles
    val pair = Seq((1L, a), (2L, b)).toDF("doc_id", "text")
    val sh = NearDup.shingles(pair, "doc_id", "text", n = 2)
    val cands = NearDup.exactCandidates(sh, 0.8).count()
    assert(cands == 1L, "boundary size-ratio pair must survive the length filter")
  }
}
