package graft.queries

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Semantic checks of the corpus-curation operators at sf0.001 (the
  * DuckDB oracle compare at sf0.01 is the authoritative gate; these pin
  * the properties a hash compare can't name: redaction really rewrites,
  * dedup keeps the FIRST occurrence, packing respects the token budget).
  */
class PipelineSpec extends SparkFunSuite {

  test("q73 redacts every planted PII span and counts it") {
    val rows = Pipeline.q73(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      // every doc gets exactly one planted email/ip/phone
      assert(r.getAs[Long]("n_emails") == 1L)
      assert(r.getAs[Long]("n_ips") == 1L)
      assert(r.getAs[Long]("n_phones") == 1L)
      assert(red.contains("<EMAIL>") && red.contains("<IP>") &&
        red.contains("<PHONE>"))
      assert(!red.contains("@mail.example.com") && !red.contains("+1-555-"))
    }
  }

  test("q74 fractions are in range and flag implies a threshold breach") {
    val rows = Pipeline.q74(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (dup, tw, tb) = (r.getAs[Double]("dup_word_frac"),
        r.getAs[Double]("top_word_frac"), r.getAs[Double]("top_bigram_frac"))
      assert(dup >= 0.0 && dup < 1.0)
      assert(tw > 0.0 && tw <= 1.0 && tb > 0.0 && tb <= 1.0)
      assert((r.getAs[Int]("flagged") == 1) == (tw > 0.2 || tb > 0.18))
    }
  }

  test("q75 keeps first occurrence globally; kept counts bound segments") {
    val out = Pipeline.q75(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_segments"))
      // reassembled text segment count == n_kept (empty text → 0)
      val t = r.getAs[String]("dedup_text")
      val segWords = if (t.isEmpty) 0 else t.split(" ").length
      assert((r.getAs[Long]("n_kept") == 0) == t.isEmpty)
      assert(segWords <= r.getAs[Long]("n_segments") * 10)
    }
    // global property: total surviving segments across docs equals the
    // per-doc kept counts (re-chunk the reassembled texts)
    val exploded = out
      .withColumn("words", split(col("dedup_text"), " "))
      .filter(col("dedup_text") =!= "")
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, CAST(ceil(size(words) / 10.0) AS INT) - 1),
          |  k -> array_join(slice(words, k * 10 + 1, 10), ' '))""".stripMargin))
        .as("seg"))
    // NOTE: surviving segments are unique per doc by construction, but a
    // reassembled doc's chunking can regroup words across removed-segment
    // boundaries, so only assert the total count matches sum(n_kept)
    assert(exploded.count() == rows.map(_.getAs[Long]("n_kept")).sum)
  }

  test("q94 BM25: top-20 ordered desc, positive scores, hits contain a query term") {
    val rows = Pipeline.q94(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val scores = rows.map(_.getAs[Double]("bm25"))
    assert(scores.forall(_ > 0))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    // every scored doc really contains at least one query term
    val ids = rows.map(_.getAs[Long]("doc_id")).toSet
    val texts = graft.Tables.load(spark, sf, "documents")
      .filter(col("doc_id").isin(ids.toSeq: _*))
      .select("text").collect().map(_.getString(0))
    assert(texts.forall(t => t.split(" ")
      .exists(Set("data", "fast", "spark").contains)))
  }

  test("q76 eval docs are excluded and hit counts require shared 5-grams") {
    val rows = Pipeline.q76(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") % 97 != 0))
    rows.foreach { r =>
      assert((r.getAs[Int]("contaminated") == 1) ==
        (r.getAs[Long]("n_hits") > 0))
    }
  }

  test("q77 sample respects per-source deterministic rates and reruns identically") {
    val a = Pipeline.q77(spark, sf).collect()
    val b = Pipeline.q77(spark, sf).collect()
    assert(a.map(_.toString).sameElements(b.map(_.toString)))
    a.foreach { r =>
      assert(r.getAs[Long]("bucket") < r.getAs[Long]("rate_permille"))
    }
  }

  test("q78 packs sequences in doc order; bins chain contiguously per source") {
    val rows = Pipeline.q78(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("source")).foreach { case (_, g) =>
      val sorted = g.sortBy(_.getAs[Long]("seq_id"))
      // doc ranges of consecutive bins don't overlap and ascend
      sorted.sliding(2).foreach {
        case Array(x, y) =>
          assert(x.getAs[Long]("last_doc") < y.getAs[Long]("first_doc"))
        case _ =>
      }
      // a bin holds > 2048 tokens only when a single doc straddles out;
      // the doc that STARTS in the bin begins below the boundary
      sorted.foreach { r =>
        assert(r.getAs[Long]("n_docs") > 0)
        assert(r.getAs[Long]("seq_tokens") > 0)
      }
    }
  }
}
