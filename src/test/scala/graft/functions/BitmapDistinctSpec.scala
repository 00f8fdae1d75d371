package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** TypedImperativeAggregate semantics: multi-partition merge (the
  * serialize/deserialize path), NULL handling, and the bounded-domain
  * guard. */
class BitmapDistinctSpec extends SparkFunSuite {

  test("merges across many partitions to the exact distinct count") {
    import spark.implicits._
    Registry.install(spark)
    // 10k values over a 1k keyspace, spread over 16 partitions so partial
    // buffers MUST serialize, shuffle, and OR together
    val df = spark.range(10000).repartition(16)
      .selectExpr("id % 1000 AS v", "id % 4 AS g")
    val got = df.groupBy("g").agg(expr("bitmap_distinct(v)").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = df.groupBy("g").agg(countDistinct("v").as("d"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("NULL ids are ignored; all-NULL group counts 0") {
    import spark.implicits._
    Registry.install(spark)
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (null, "a"), (1L, "a"),
      (null, "b")).toDF("v", "g")
    val got = df.groupBy("g").agg(expr("bitmap_distinct(v)").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 0L))
  }

  test("non-integral id is an analysis error, not a mid-job cast crash") {
    import spark.implicits._
    Registry.install(spark)
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("abc").toDF("v").agg(expr("bitmap_distinct(v)")).collect()
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
    // integer (narrower integral) children are accepted and exact
    val n = spark.range(100).selectExpr("CAST(id % 7 AS INT) AS v")
      .agg(expr("bitmap_distinct(v)")).head().getLong(0)
    assert(n == 7L)
  }

  test("out-of-range id fails loudly instead of wrapping") {
    import spark.implicits._
    Registry.install(spark)
    val e = intercept[Exception] {
      Seq(-1L).toDF("v").agg(expr("bitmap_distinct(v)")).collect()
    }
    assert(e.getMessage != null)
  }

  test("q95 equals the exact distinct at sf0.001") {
    val got = graft.queries.Rel.q95(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = graft.Tables.load(spark, sf, "events")
      .groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
