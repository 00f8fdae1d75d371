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

  test("q99 cube: both margins add up; cube == explicit GROUPING SETS") {
    val rows = Rel.q99(spark, sf).collect()
    val n = graft.Tables.load(spark, sf, "events").count()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getAs[Long]("n_events") == n)
    // each margin's subtotals sum to the grand total (additivity BOTH ways
    // — the property ROLLUP only has for one axis)
    val typeMargin = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(_.getAs[Long]("n_events")).sum
    val monthMargin = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
      .map(_.getAs[Long]("n_events")).sum
    assert(typeMargin == n && monthMargin == n)
    // the cube operator is exactly the four explicit grouping sets
    val ev = graft.Tables.load(spark, sf, "events")
      .withColumn("month", month(col("ts")).cast("long"))
    val viaSets = ev.groupingSets(
        Seq(Seq(col("event_type"), col("month")), Seq(col("event_type")),
          Seq(col("month")), Seq.empty),
        col("event_type"), col("month"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double")
          .as("total_value"))
      .orderBy(col("event_type").asc_nulls_first, col("month").asc_nulls_first)
      .collect()
    assert(viaSets.toSeq == rows.toSeq)
  }

  test("q86 semi + anti partition the customer table") {
    val rows = Rel.q86(spark, sf).collect()
    val total = graft.Tables.load(spark, sf, "customer").count()
    assert(rows.map(r => r.getAs[Long]("with_orders") +
      r.getAs[Long]("without_orders")).sum == total)
  }

  test("q89 frames: running_total ends at the event count; ma7 bounded by window extremes") {
    val rows = Rel.q89(spark, sf).collect()
    val n = graft.Tables.load(spark, sf, "events").count()
    assert(rows.last.getAs[Long]("running_total") == n)
    val counts = rows.map(_.getAs[Long]("n_events"))
    rows.zipWithIndex.foreach { case (r, i) =>
      val win = counts.slice(math.max(0, i - 6), i + 1)
      assert(r.getAs[Double]("ma7") >= win.min - 1e-9 &&
        r.getAs[Double]("ma7") <= win.max + 1e-9)
    }
  }

  test("q90 ranks: quartiles balanced within 1, pct_rank monotone in balance order") {
    val rows = Rel.q90(spark, sf).collect()
    rows.groupBy(_.getAs[String]("c_mktsegment")).foreach { case (_, g) =>
      val sizes = g.groupBy(_.getAs[Int]("quartile")).view.mapValues(_.length).values
      assert(sizes.max - sizes.min <= 1) // ntile balance property
      val ordered = g.sortBy(r =>
        (-r.getAs[Double]("c_acctbal"), r.getAs[Long]("c_custkey")))
      assert(ordered.map(_.getAs[Double]("pct_rank")).sliding(2).forall {
        case Array(a, b) => a <= b; case _ => true
      })
    }
  }

  test("q91 unpivot inverts q84's pivot: totals agree") {
    val long = Rel.q91(spark, sf).collect()
    val wide = Rel.q84(spark, sf).collect()
    val wideTotal = wide.map(r => (1 to 5).map(i => r.getLong(i)).sum).sum
    assert(long.map(_.getAs[Long]("n_orders")).sum == wideTotal)
  }

  test("q87 inclusion-exclusion holds: |A∪B| = |A\\B| + |B|") {
    val got = Rel.q87(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val purchasers = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase")
      .select("user_id").distinct().count()
    assert(got("view_or_purchase") ==
      got("view_never_purchase") + purchasers)
    // the partition identity on the OTHER side: viewers split exactly
    // into those who also purchased and those who never did
    val viewers = graft.Tables.load(spark, sf, "events")
      .filter(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(got("view_and_purchase") + got("view_never_purchase") == viewers)
  }
}
