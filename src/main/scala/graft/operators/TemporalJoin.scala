package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, composed from
  * shuffle-minimal primitives (brief: prefer composing existing ops over a
  * custom SparkPlan when semantics allow — both of these do).
  *
  * As-of join: the classic distributed formulation — UNION the two sides,
  * one shuffle + sort on (key, time, side), and a running `last(_, ignore
  * nulls)` window carries the most recent right-side row forward into each
  * left row. No join node at all, so no candidate explosion on hot keys:
  * cost is exactly one exchange of left+right and a per-partition sort,
  * the same shape at 100 TB (the window is per-key, keys grow with data).
  *
  * Range join: equi-join on (key, time-bucket) with the right side
  * exploded into the buckets its window overlaps, then an exact residual
  * filter. Turns an inequality join Spark would nested-loop into a hash
  * join whose fan-out is ceil(window/bucket)+1 rows — bucket ≈ window
  * keeps it ≤ 2×.
  */
object TemporalJoin {

  /** For each `left` row, the single most recent `right` row with the same
    * `key` and `rightTime <= leftTime` (inclusive — at equal times the
    * right row is visible to the left row). `right` must be unique per
    * (key, time); pre-aggregate it if not, or the carried value is
    * order-dependent.
    *
    * Output: all `left` columns plus `right`'s `carry` columns, null when
    * no right row precedes.
    *
    * The carry columns travel as ONE struct: the running `last` must pick
    * the most recent right ROW atomically. Per-column `last(_, ignore
    * nulls)` would skip a NULL field in the newest row and backfill it
    * from an OLDER row — a chimera of two right rows that no real as-of
    * join (or the DuckDB ASOF oracle) produces. The struct itself is
    * non-null exactly on right rows, so ignoreNulls skips left rows only;
    * its FIELDS may be null and are carried as-is.
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      time: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val carryType = org.apache.spark.sql.types.StructType(
      carry.map(c => org.apache.spark.sql.types.StructField(
        c, right.schema(c).dataType, nullable = true)))
    // side=0 sorts right rows before left rows at equal (key, time):
    // a right row AT the left row's time is matched (inclusive as-of).
    val l = left.withColumn("__side", lit(1))
      .select(leftCols.map(col) :+ col("__side") :+
        lit(null).cast(carryType).as("__r"): _*)
    val r = right.withColumn("__side", lit(0))
      .select(leftCols.map(c =>
        if (c == key || c == time) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side") :+
        struct(carry.map(col): _*).as("__r"): _*)
    val w = Window.partitionBy(key).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__r_last", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        carry.map(c => col(s"__r_last.$c").as(s"asof_$c")): _*)
  }

  /** For each `right` row (the "anchor"), count `left` rows with the same
    * `key` whose time falls in [anchorTime - windowSec, anchorTime).
    * Bucketed: both sides key on (key, floor(epoch/windowSec)); each
    * anchor probes its own bucket and the one before — the only two a
    * half-open window of length `windowSec` can overlap. Anchors with an
    * empty window are kept with count 0.
    */
  def countPreceding(left: DataFrame, anchors: DataFrame, key: String,
      time: String, anchorId: String, windowSec: Long): DataFrame = {
    val lb = left.select(col(key), col(time).as("__lt"),
      (unix_timestamp(col(time)) / windowSec).cast("long").as("__bkt"))
    val ab = anchors.select(col(anchorId), col(key), col(time).as("__at"),
        explode(array(
          ((unix_timestamp(col(time)) / windowSec).cast("long") - 1),
          (unix_timestamp(col(time)) / windowSec).cast("long"))).as("__bkt"))
    val counted = ab.join(lb, Seq(key, "__bkt"))
      .filter(col("__lt") >= col("__at") - expr(s"INTERVAL $windowSec SECOND")
        && col("__lt") < col("__at"))
      .groupBy(anchorId).agg(count(lit(1)).as("n_in_window"))
    anchors.select(col(anchorId), col(key), col(time))
      .join(counted, Seq(anchorId), "left")
      .withColumn("n_in_window", coalesce(col("n_in_window"), lit(0L)))
  }
}
