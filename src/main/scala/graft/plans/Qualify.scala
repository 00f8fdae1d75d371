package graft.plans

/** Snowflake-dialect shims for SQL text that OSS Spark SQL does not parse.
  *
  * The reference's query corpus uses `QUALIFY` to filter on window-function
  * results (reference `demo-setup/performance-tests/performance_comparison.sql:172`,
  * `run_performance_tests.py:208`). Spark has no QUALIFY clause, so we desugar
  *
  * {{{ SELECT ... FROM ... [WHERE ...] QUALIFY <pred> [ORDER BY ...] [LIMIT n] }}}
  *
  * into
  *
  * {{{ SELECT * FROM ( SELECT ... FROM ... [WHERE ...] ) __qualify
  *     WHERE <pred> [ORDER BY ...] [LIMIT n] }}}
  *
  * which is the standard-SQL equivalent (the predicate references select-list
  * aliases of the window expressions, legal in the outer query). The scanner
  * is paren- and quote-aware so QUALIFY/ORDER/LIMIT inside subqueries,
  * strings, or identifiers are not touched; only a top-level QUALIFY
  * triggers the rewrite.
  */
object Qualify {

  /** Desugar a top-level QUALIFY clause; SQL without one passes through.
    *
    * Two Snowflake forms are supported:
    *  - alias form (`QUALIFY event_rank <= 5`, the reference's usage):
    *    the predicate references a select-list alias → plain outer filter;
    *  - direct window form (`QUALIFY ROW_NUMBER() OVER (…) <= 5`): the
    *    predicate itself contains a window function, which cannot appear
    *    in a WHERE clause — it is hoisted into a projected boolean column
    *    and filtered in the outer query, then dropped via `* EXCEPT`.
    */
  def desugar(sql: String): String = {
    val qualifyPos = topLevelKeyword(sql, "QUALIFY")
    qualifyPos match {
      case None => sql
      case Some(qStart) =>
        val head = sql.substring(0, qStart)
        val rest = sql.substring(qStart + "QUALIFY".length)
        // the predicate runs until a top-level ORDER BY / LIMIT or end
        val tailStart = Seq("ORDER", "LIMIT")
          .flatMap(k => topLevelKeyword(rest, k))
          .sorted.headOption.getOrElse(rest.length)
        val pred = rest.substring(0, tailStart).trim
        val tail = rest.substring(tailStart)
        if (topLevelKeyword(pred, "OVER").isEmpty)
          s"SELECT * FROM (\n$head\n) __qualify WHERE $pred\n$tail"
        else {
          // window expression in the predicate: it may reference base
          // columns the select list does not project, so the condition is
          // injected into the ORIGINAL select list (where those columns
          // are in scope), filtered outside, and dropped via * EXCEPT
          val fromPos = topLevelKeyword(head, "FROM").getOrElse(
            throw new IllegalArgumentException(s"no top-level FROM in: $head"))
          val injected = head.substring(0, fromPos).stripTrailing() +
            s", ($pred) AS __qualify_cond\n" + head.substring(fromPos)
          s"""SELECT * EXCEPT (__qualify_cond) FROM (
             |$injected
             |) __qualify WHERE __qualify_cond
             |$tail""".stripMargin
        }
    }
  }

  /** Index of a keyword at paren depth 0, outside quotes, as a full word. */
  private def topLevelKeyword(sql: String, kw: String): Option[Int] = {
    var depth = 0
    var i = 0
    val n = sql.length
    val up = sql.toUpperCase(java.util.Locale.ROOT)
    while (i < n) {
      sql.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' | '"' | '`' =>
          val quote = sql.charAt(i)
          i += 1
          while (i < n && sql.charAt(i) != quote) i += 1
          i += 1
        case _ =>
          if (depth == 0 && up.startsWith(kw, i) &&
              (i == 0 || !isWordChar(sql.charAt(i - 1))) &&
              (i + kw.length >= n || !isWordChar(sql.charAt(i + kw.length))))
            return Some(i)
          i += 1
      }
    }
    None
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'
}

/** Parser-level QUALIFY: a delegating `ParserInterface` injected via
  * [[GraftExtensions]] that runs [[Qualify.desugar]] on every statement
  * before handing it to Spark's parser — `spark.sql("… QUALIFY …")` then
  * works directly on an extensions-enabled session, no pre-processing
  * call. Dual-path by design, like governance (rule vs `secureView`):
  * the TEXT desugar stays the library API for sessions built without
  * extensions, and both surfaces share the one scanner, so their
  * semantics cannot drift. Statements without a top-level QUALIFY pass
  * through byte-identical ([[Qualify.desugar]] returns its input), so
  * the wrapper costs one keyword scan per statement.
  *
  * Since round 16 the same wrapper also desugars graft-catalog view DDL
  * (`CREATE [OR REPLACE] VIEW cat.ns.v AS …` / `DROP VIEW cat.ns.v`) to
  * the `create_view`/`drop_view` procedure calls — see [[ViewDdl]] — and
  * since round 17 Iceberg's partition-evolution spellings
  * (`ALTER TABLE cat.ns.t ADD/DROP/REPLACE PARTITION FIELD …`) to
  * `set_partition_spec` — see [[PartitionDdl]]; the rewrites fire only on
  * statements (parsePlan), never on parseQuery, and only when the
  * identifier's catalog part names a GraftCatalog in `session` (absent a
  * session, DDL passes through untouched). */
class QualifyParser(delegate: org.apache.spark.sql.catalyst.parser.ParserInterface,
    session: Option[org.apache.spark.sql.SparkSession] = None)
    extends org.apache.spark.sql.catalyst.parser.ParserInterface {

  private def isGraftCatalog(name: String): Boolean =
    session.exists { sp =>
      try sp.sessionState.catalogManager.catalog(name)
        .isInstanceOf[graft.table.GraftCatalog]
      catch { case _: Exception => false }
    }
  import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.types.{DataType, StructType}

  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(Qualify.desugar(PartitionDdl.desugar(
      ViewDdl.desugar(sqlText, isGraftCatalog), isGraftCatalog)))
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(Qualify.desugar(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
