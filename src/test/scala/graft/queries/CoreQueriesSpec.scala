package graft.queries

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Spot-checks of the query corpus at sf0.001 (the oracle compare at
  * sf0.01 is the authoritative gate; these pin a few absolute values so a
  * data or anchor regression fails fast in `sbt test`). */
class CoreQueriesSpec extends SparkFunSuite {

  test("q01 counts all events") {
    assert(Core.q01(spark, sf).head().getLong(0) == 1000L)
  }

  test("q05 region report covers every active segment, rates in range") {
    val rows = Core.q05(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 5)
    val rates = rows.map(_.getAs[Double]("purchase_rate"))
    assert(rates.forall(r => r >= 0.0 && r <= 100.0))
    // ordered by total_events desc
    val totals = rows.map(_.getAs[Long]("total_events"))
    assert(totals.sameElements(totals.sorted.reverse))
  }

  test("q10 returns at most 5 rows per user, ranked") {
    val rows = Core.q10(spark, sf).collect()
    val perUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(perUser.values.forall(_.length <= 5))
    assert(perUser.values.forall(g =>
      g.map(_.getAs[Int]("event_rank")).sorted.sameElements(1 to g.length)))
  }

  test("q12 funnel counts are monotonically consistent") {
    val r = Core.q12(spark, sf).head()
    val total = r.getAs[Long]("total_users")
    assert(total > 0)
    assert(r.getAs[Long]("viewers") <= total)
    assert(r.getAs[Long]("purchasers") <= total)
  }

  test("q30 exact dedup keeps one representative per distinct text") {
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(Llm.q30(spark, sf).count() == docs.select("text").distinct().count())
  }

  test("q35 near-dup pairs are symmetric-free and above threshold") {
    val rows = Llm.q35(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b")))
    assert(rows.forall(_.getAs[Double]("jaccard") >= 0.8))
  }

  test("q37 ANN returns exactly top-5 per query vector") {
    val rows = Llm.q37(spark, sf).collect()
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.size == 10)
    assert(perQuery.values.forall(_.length == 5))
    // ranks ordered by descending similarity
    perQuery.values.foreach { g =>
      val byRank = g.sortBy(_.getAs[Int]("nn_rank")).map(_.getAs[Double]("cos_sim"))
      assert(byRank.sameElements(byRank.sorted.reverse))
    }
  }
}
