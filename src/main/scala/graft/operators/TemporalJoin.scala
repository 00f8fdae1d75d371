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
    */
  def asofBackward(left: DataFrame, right: DataFrame, key: String,
      time: String, carry: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // side=0 sorts right rows before left rows at equal (key, time):
    // a right row AT the left row's time is matched (inclusive as-of).
    val l = left.withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        carry.map(c => lit(null).cast(right.schema(c).dataType).as(s"__r_$c")): _*)
    val r = right.withColumn("__side", lit(0))
      .select((leftCols.map(c =>
        if (c == key || c == time) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+ col("__side")) ++
        carry.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(key).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .select((leftCols.map(col) :+ col("__side")) ++
        carry.map(c => last(col(s"__r_$c"), ignoreNulls = true).over(w)
          .as(s"asof_$c")): _*)
      .filter(col("__side") === 1)
      .drop("__side")
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
