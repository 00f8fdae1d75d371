package graft.operators

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkFunSuite {

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // heavily skewed: 90% of rows share one key
    val large = (1 to 2000).map(i => (if (i % 10 == 0) i.toLong else 7L, i))
      .toDF("k", "payload")
    val small = Seq((7L, "hot"), (10L, "ten"), (20L, "twenty"))
      .toDF("k", "label")
    val salted = SkewJoin.saltedJoin(large, small, "k", saltFactor = 8)
    val plain = large.join(small, "k")
    assert(salted.count() == plain.count())
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salt column does not leak into the output") {
    import spark.implicits._
    val large = Seq((1L, "a")).toDF("k", "v")
    val small = Seq((1L, "x")).toDF("k", "w")
    val out = SkewJoin.saltedJoin(large, small, "k", 4)
    assert(!out.columns.exists(_.contains("salt")))
  }

  test("IVF ANN returns ranked neighbors per query") {
    // the candidate path (q50's registry row is the recall summary)
    val rows = graft.queries.Llm.ivfTopK(spark, sf).collect()
    assert(rows.nonEmpty)
    val perQuery = rows.groupBy(_.getAs[Long]("query_id"))
    assert(perQuery.values.forall(_.length <= 5))
    perQuery.values.foreach { g =>
      val sims = g.sortBy(_.getAs[Int]("nn_rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.sameElements(sims.sorted.reverse))
    }
  }
}
