package graft.queries

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Cross-query identities for the relational-completeness operators —
  * properties the per-query hash compare can't express. */
class RelSpec extends SparkFunSuite {

  test("q84 pivot cells sum to the joined row count") {
    val rows = Rel.q84(spark, sf).collect()
    val cells = rows.map(r => (1 to 5).map(i => r.getLong(i)).sum).sum
    val joined = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        col("o_custkey") === col("c_custkey")).count()
    assert(cells == joined)
  }

  test("q85 rollup: grand total row equals the event count; subtotals add up") {
    val rows = Rel.q85(spark, sf).collect()
    val n = graft.Tables.load(spark, sf, "events").count()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getAs[Long]("n_events") == n)
    // per-type subtotal (day IS NULL, type NOT NULL) = sum of its day rows
    val subtotals = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(r => r.getString(0) -> r.getAs[Long]("n_events")).toMap
    val dayRows = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("n_events")).sum)
    assert(subtotals == dayRows.toMap)
  }

  test("q86 semi + anti partition the customer table") {
    val rows = Rel.q86(spark, sf).collect()
    val total = graft.Tables.load(spark, sf, "customer").count()
    assert(rows.map(r => r.getAs[Long]("with_orders") +
      r.getAs[Long]("without_orders")).sum == total)
  }

  test("q87 inclusion-exclusion holds: |A∪B| = |A\\B| + |B|") {
    val got = Rel.q87(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val purchasers = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(got("view_or_purchase") ==
      got("view_never_purchase") + purchasers)
    assert(got("view_and_purchase") + got("view_never_purchase") ==
      got("view_or_purchase") - purchasers + got("view_and_purchase"))
  }
}
