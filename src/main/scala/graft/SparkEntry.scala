package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator registry: the reference's canonical
  * corpus Q1–Q15 (SURVEY §2.12) plus operator-coverage extras
  * ([[graft.queries.Core]]), the LLM-data-pipeline operators
  * ([[graft.queries.Llm]]), and table-layer / streaming operators
  * ([[graft.queries.Ops]]). `oracleSql` holds the DuckDB-runnable
  * equivalent for every SQL-expressible entry; column names and types are
  * aligned on both sides (the driver's compare hashes values under
  * name-sorted columns).
  */
object SparkEntry {

  /** Flagship query (Q5 region join report, reference
    * `performance_comparison.sql:91-101`) on sf=0.001; driver smoke-checks
    * rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Core.q05(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Core.queries ++ graft.queries.Llm.queries ++
      graft.queries.Ops.queries ++ graft.queries.Pipeline.queries ++
      graft.queries.Temporal.queries ++ graft.queries.Rel.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate LSH ANN) → driver records a weaker rows-only check. */
  def oracleSql: Map[String, String] =
    graft.queries.Core.oracle ++ graft.queries.Llm.oracle ++
      graft.queries.Ops.oracle ++ graft.queries.Pipeline.oracle ++
      graft.queries.Temporal.oracle ++ graft.queries.Rel.oracle
}
