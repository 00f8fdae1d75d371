package graft.plans

/** Snowflake→Spark SQL dialect shims (SURVEY §4.3): the reference's query
  * text runs unmodified after these rewrites.
  *
  *  - `QUALIFY <pred>` → outer-query filter ([[Qualify.desugar]]);
  *  - `AT(TIMESTAMP => <expr>)` → `TIMESTAMP AS OF <expr>` (time travel,
  *    reference `performance_comparison.sql:129-131`), served by the
  *    graft DSv2 catalog;
  *  - `DATE(x)`, `CURRENT_DATE - n`, decimal `x / 1000.0` division, and
  *    `CEIL`/`ROUND` parse natively in Spark SQL — no rewrite needed.
  */
object QueryCompiler {

  private val AtOpen = """(?i)\bAT\s*\(\s*TIMESTAMP\s*=>\s*""".r

  /** Translate Snowflake-dialect SQL into Spark-parseable SQL. */
  def compile(sql: String): String = Qualify.desugar(rewriteAt(sql))

  /** Paren-aware rewrite of `AT(TIMESTAMP => <expr>)` — the expr may
    * itself contain parentheses (`CURRENT_TIMESTAMP() - INTERVAL 1 DAY`),
    * so the closing paren is found by depth counting, not regex. */
  private def rewriteAt(sql: String): String =
    AtOpen.findFirstMatchIn(sql) match {
      case None => sql
      case Some(m) =>
        var depth = 1
        var i = m.end
        while (i < sql.length && depth > 0) {
          sql.charAt(i) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          i += 1
        }
        val expr = sql.substring(m.end, i - 1).trim
        rewriteAt(sql.substring(0, m.start) + s"TIMESTAMP AS OF $expr" + sql.substring(i))
    }
}
