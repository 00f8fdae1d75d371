package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.catalog.Identifier

/** Resolution rule for PERSISTED CATALOG VIEWS (the Snowflake
  * `CREATE VIEW` surface over the graft catalog).
  *
  * Stock Spark 4.1 ships the `ViewCatalog` connector API but its analyzer
  * never calls `loadView` — `SELECT … FROM cat.db.view` dies with
  * TABLE_OR_VIEW_NOT_FOUND, and `CREATE VIEW` on a v2 catalog is refused
  * in `ResolveSessionCatalog` (probed empirically; Iceberg's Spark
  * extensions carry their own view-resolution rules for exactly this
  * reason). So, same shape here: this rule substitutes an unresolved
  * 3-part relation whose catalog is a [[graft.table.GraftCatalog]] and
  * whose identifier names a stored view with the view's parsed SQL, and
  * the fixed-point Resolution batch then resolves the substituted body
  * like any subquery — the view REPLANS against current table state on
  * every read (a warehouse view, not a snapshot). DDL rides the already-
  * supported procedure surface (`CALL graft.system.create_view /
  * drop_view`), not parser interception.
  *
  * Views may reference other views (the substitution re-fires on the
  * nested body). DIRECT self-reference is refused at substitution time;
  * longer cycles are caught by the analyzer's fixed-point iteration
  * limit rather than looping forever.
  */
class GraftViewRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 3 =>
        substitute(u).getOrElse(u)
    }

  private def substitute(u: UnresolvedRelation): Option[LogicalPlan] = {
    val parts = u.multipartIdentifier
    val cat =
      try spark.sessionState.catalogManager.catalog(parts.head)
      catch { case _: Exception => return None }
    cat match {
      case g: graft.table.GraftCatalog =>
        val ident = Identifier.of(parts.tail.init.toArray, parts.last)
        if (!g.viewExists(ident)) None
        else {
          val v = g.loadView(ident)
          // CTE substitution runs in the analyzer's FIRST batch, which has
          // already finished by the time this resolution rule splices the
          // body in — without re-running it here a stored `WITH x AS …`
          // would reach CheckAnalysis as an unsubstituted UnresolvedWith
          // (TABLE_OR_VIEW_NOT_FOUND on the CTE name)
          val body = org.apache.spark.sql.catalyst.analysis.CTESubstitution(
            spark.sessionState.sqlParser.parsePlan(v.query()))
          val selfRef = body.collectFirst {
            case n: UnresolvedRelation
                if n.multipartIdentifier.map(_.toLowerCase) ==
                  parts.map(_.toLowerCase) => n
          }
          require(selfRef.isEmpty,
            s"view ${parts.mkString(".")} references itself")
          Some(SubqueryAlias(parts.last, body))
        }
      case _ => None
    }
  }
}
