package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-layer and streaming operator queries (time travel, compaction,
  * schema evolution, streaming ingest, MV refresh, governance). Filled by
  * the snapshot-log milestone; see [[graft.table.SnapshotLog]].
  */
object Ops {
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  val oracle: Map[String, String] = Map()
}
