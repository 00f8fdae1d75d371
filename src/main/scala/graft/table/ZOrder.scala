package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton curve) layout for multi-dimensional file clustering —
  * the reference's Snowflake-style clustering key
  * (`aws-community-builders-presentation.md:302-307`) re-expressed for
  * file-stat pruning.
  *
  * Lexicographic range-clustering on (a, b) gives files disjoint ranges
  * of `a` only; predicates on `b` overlap every file. The Z-curve
  * interleaves the bits of all clustering columns
  * ([[graft.functions.InterleaveBits]]), so a sorted run of rows — and
  * therefore each written file — covers a small hyper-rectangle in
  * (a, b, …) space and the manifest min/max stats prune on EACH column
  * independently. Same mechanism Delta's OPTIMIZE ZORDER BY uses.
  */
object ZOrder {

  /** Cast `c` to a double for code-space scaling (dates via epoch days —
    * Spark has no date→double cast; timestamps cast to epoch seconds). */
  private[table] def numeric(df: DataFrame, c: String): Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.DateType =>
        datediff(col(c), to_date(lit("1970-01-01"))).cast("double")
      case _ => col(c).cast("double")
    }

  /** Linear min-max scaling of `c` to a 16-bit code. Approximate bounds
    * are fine — codes are bucket labels, never read back as values — but
    * heavy skew degrades to fewer effective buckets (the quantile-based
    * refinement if that bites). */
  private def code(df: DataFrame, c: String, lo: Double, hi: Double): Column = {
    val span = hi - lo
    if (span <= 0 || span.isNaN) lit(0)
    else least(lit(65535), greatest(lit(0),
      floor((numeric(df, c) - lit(lo)) / lit(span) * 65536))).cast("int")
  }

  /** Arrange `df` in Z-order over `cols` (2–4): per-column 16-bit codes
    * scaled by `bounds` — typically derived from manifest stats, costing
    * zero extra data passes — interleaved into a Morton key, then
    * range-partitioned into `nPartitions` and sorted within partitions.
    * Content is unchanged; only row/file placement moves. */
  def arrange(df: DataFrame, cols: Seq[String],
      bounds: Map[String, (Double, Double)], nPartitions: Int): DataFrame = {
    require(cols.size >= 2 && cols.size <= 4, "z-order needs 2-4 columns")
    graft.functions.Registry.install(df.sparkSession)
    val names = cols.indices.map(i => s"__zc$i")
    var out = df
    cols.zip(names).foreach { case (c, nm) =>
      val (lo, hi) = bounds(c)
      out = out.withColumn(nm, code(df, c, lo, hi))
    }
    out
      .withColumn("__z", expr(s"interleave_bits(${names.mkString(", ")})"))
      .repartitionByRange(nPartitions, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z" +: names: _*)
  }
}
