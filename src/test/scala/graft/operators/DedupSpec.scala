package graft.operators

import graft.SparkFunSuite

class DedupSpec extends SparkFunSuite {

  test("exact and hash-based dedup agree and keep the lowest id") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha"), (2L, "alpha"), (3L, "beta"),
      (4L, "beta"), (5L, "gamma")).toDF("id", "text")
    val byKey = Dedup.exact(df, Seq("text"), "id")
    val byHash = Dedup.exactByHash(df, "text", "id")
    assert(byKey.count() == 3 && byHash.count() == 3)
    assert(byKey.select("id").as[Long].collect().sorted.sameElements(Array(1L, 3L, 5L)))
    assert(byKey.exceptAll(byHash).isEmpty && byHash.exceptAll(byKey).isEmpty)
  }

  test("groups reports representative and multiplicity") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "text")
    val g = Dedup.groups(df, "text", "id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(g == Map(1L -> 2L, 3L -> 1L))
  }
}
