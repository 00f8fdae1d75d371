package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact deduplication operators.
  *
  * At 100 TB the shuffle key matters more than the algorithm: grouping on
  * the raw content column moves the full text through the exchange, while
  * grouping on a 256-bit content hash moves 32 bytes per row — same
  * result (SHA-256 collisions are ignorable), ~100× less shuffle IO for
  * long documents. Both keep a deterministic representative per group.
  */
object Dedup {

  /** Keep the row with the lowest tie-breaker per exact-duplicate group,
    * deduplicating on the raw key columns (fine for short keys). */
  def exact(df: DataFrame, keyCols: Seq[String], tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(tieBreaker))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Same semantics, but shuffle on sha2(content) instead of the content
    * itself — the scale path for long-text corpora. */
  def exactByHash(df: DataFrame, contentCol: String, tieBreaker: String): DataFrame = {
    val w = Window.partitionBy(col("__h")).orderBy(col(tieBreaker))
    df.withColumn("__h", sha2(col(contentCol), 256))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__h", "__rn")
  }

  /** Duplicate-group summary: representative id + group size per distinct
    * content value (the shape q30 reports). */
  def groups(df: DataFrame, contentCol: String, idCol: String): DataFrame =
    df.withColumn("__h", sha2(col(contentCol), 256))
      .groupBy("__h")
      .agg(min(col(idCol)).as("keep_doc_id"), count(lit(1)).as("dup_count"))
      .select("keep_doc_id", "dup_count")
}
