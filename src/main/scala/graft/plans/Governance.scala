package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.functions._

/** Row-access and column-masking policies (reference G1/G2,
  * `aws-community-builders-presentation.md:770-781`).
  *
  * Two enforcement paths:
  *  - [[GovernanceRule]], a `Rule[LogicalPlan]` injected at resolution time
  *    via [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`):
  *    rewrites every reference to a policied table into a filtered subtree,
  *    so ad-hoc SQL cannot bypass the policy;
  *  - [[Governance.secureView]], the library-level secure-view constructor
  *    for sessions built without the extension.
  *
  * Policies are predicate/mask templates evaluated per-row on executors —
  * no driver work, no extra shuffle (the Filter pushes down like any other).
  */
object Governance {

  /** G1: only rows satisfying `predicateSql` are visible in `table`. */
  case class RowPolicy(table: String, predicateSql: String)

  /** G2: `column` of `table` reads as '***MASKED***' unless privileged. */
  case class MaskPolicy(table: String, column: String)

  val Masked = "***MASKED***"

  // Session-wide policy registry (keyed by lowercase table name).
  @volatile private var rowPolicies: Map[String, RowPolicy] = Map.empty
  @volatile private var maskPolicies: Map[String, Seq[MaskPolicy]] = Map.empty

  /** Privilege is per-session but NOT a boolean conf: a plain conf key could
    * be flipped by any SQL user via `SET ...=true`, silently disabling masks.
    * Instead [[setPrivileged]] (an API call the SQL surface cannot reach)
    * mints an unguessable token, registers it here, and stores it in the
    * session conf. Lookup requires conf token ∈ registry, so:
    *  - an unprivileged user cannot enable masks-off without guessing a
    *    random UUID (SET of an arbitrary value fails the registry check);
    *  - session CLONES keep privilege — Spark clones sessions for
    *    structured-streaming micro-batches and some exec paths, and
    *    `cloneSession()` copies the conf, carrying the token along (a
    *    session-object-identity registry silently dropped privilege there);
    *  - `RESET`/un-set loses privilege — fail-closed.
    * Two sessions sharing one JVM/SparkContext (the multi-tenant shape on a
    * shared cluster) still hold independent privilege levels. */
  private val TokenKey = "graft.governance.token"
  private val privilegedTokens =
    java.util.Collections.newSetFromMap(
      new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]())
  def privileged(spark: SparkSession): Boolean =
    spark.conf.getOption(TokenKey).exists(privilegedTokens.contains)
  /** Registry size, exposed for the accretion regression test only. */
  private[graft] def tokenCount: Int = privilegedTokens.size()
  def setPrivileged(spark: SparkSession, p: Boolean): Unit =
    if (p) {
      // retire the session's previous token first: re-privileging must not
      // accrete registry entries (each would stay a valid mask-bypass
      // secret forever, and the set would grow without bound)
      spark.conf.getOption(TokenKey).foreach(privilegedTokens.remove)
      val token = java.util.UUID.randomUUID().toString
      privilegedTokens.add(token)
      spark.conf.set(TokenKey, token)
    } else {
      spark.conf.getOption(TokenKey).foreach(privilegedTokens.remove)
      spark.conf.unset(TokenKey)
    }

  def addRowPolicy(p: RowPolicy): Unit =
    rowPolicies += (p.table.toLowerCase -> p)
  def addMaskPolicy(p: MaskPolicy): Unit =
    maskPolicies += (p.table.toLowerCase ->
      (maskPolicies.getOrElse(p.table.toLowerCase, Seq.empty) :+ p))
  def clearPolicies(): Unit = { rowPolicies = Map.empty; maskPolicies = Map.empty }

  private[plans] def rowPolicy(table: String): Option[RowPolicy] =
    rowPolicies.get(table.toLowerCase)
  private[plans] def masks(spark: SparkSession, table: String): Seq[MaskPolicy] =
    if (privileged(spark)) Seq.empty
    else maskPolicies.getOrElse(table.toLowerCase, Seq.empty)

  /** Library-level enforcement: apply the registered policies for `table`
    * to `df` (row filter first, then masking projection). */
  def secureView(spark: SparkSession, table: String, df: DataFrame): DataFrame = {
    val filtered = rowPolicy(table) match {
      case Some(p) => df.filter(expr(p.predicateSql))
      case None => df
    }
    val maskCols = masks(spark, table).map(_.column).toSet
    if (maskCols.isEmpty) filtered
    else filtered.select(filtered.columns.map { c =>
      if (maskCols.contains(c)) lit(Masked).as(c) else col(c)
    }.toSeq: _*)
  }
}

/** Resolution rule: wraps each policied table's subtree in a Filter and a
  * masking Project. Applied once per node (guarded by a tree tag). */
class GovernanceRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import Governance._

  private val applied = TreeNodeTag[Boolean]("graft.governance.applied")

  /** Policies attach to TABLE references only: the alias must wrap a
    * scan-shaped subtree (leaf relation, optionally under views /
    * projections / filters). A derived subquery that merely shares a
    * policied table's name is left alone — applying the policy there
    * would inject predicates over columns the subquery may not have. */
  private def isScanSubtree(p: LogicalPlan): Boolean = p match {
    case _: org.apache.spark.sql.catalyst.plans.logical.LeafNode => true
    case v: org.apache.spark.sql.catalyst.plans.logical.View => isScanSubtree(v.child)
    case prj: org.apache.spark.sql.catalyst.plans.logical.Project => isScanSubtree(prj.child)
    case f: Filter => isScanSubtree(f.child)
    case a: SubqueryAlias => isScanSubtree(a.child)
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformUpWithNewOutput {
      case s @ SubqueryAlias(ident, child)
          if s.getTagValue(applied).isEmpty && child.resolved &&
            isScanSubtree(child) &&
            (rowPolicy(ident.name).isDefined || masks(spark, ident.name).nonEmpty) =>
        var inner: LogicalPlan = child
        rowPolicy(ident.name).foreach { p =>
          inner = Filter(spark.sessionState.sqlParser.parseExpression(p.predicateSql), inner)
        }
        val maskCols = masks(spark, ident.name).map(_.column).toSet
        var mapping = Seq.empty[(org.apache.spark.sql.catalyst.expressions.Attribute,
          org.apache.spark.sql.catalyst.expressions.Attribute)]
        if (maskCols.nonEmpty) {
          // masked columns get FRESH exprIds (a duplicate id would confuse
          // the optimizer's alias substitution); transformUpWithNewOutput
          // rewrites parent references via the returned mapping
          val projections = child.output.map { attr =>
            if (maskCols.contains(attr.name)) {
              val a = org.apache.spark.sql.catalyst.expressions.Alias(
                org.apache.spark.sql.catalyst.expressions.Cast(
                  org.apache.spark.sql.catalyst.expressions.Literal(Masked),
                  attr.dataType), attr.name)()
              mapping :+= (attr -> a.toAttribute)
              a
            } else attr
          }
          inner = org.apache.spark.sql.catalyst.plans.logical.Project(projections, inner)
        }
        val out = SubqueryAlias(ident, inner)
        out.setTagValue(applied, true)
        out -> mapping
    }
}

/** `SparkSessionExtensions` hook: injects [[GovernanceRule]] at resolution
  * and the QUALIFY-desugaring delegating parser ([[QualifyParser]]). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // view substitution runs before governance so a policied table inside
    // a view body still gets wrapped by the governance rule's own pass
    ext.injectResolutionRule(sp => new GraftViewRule(sp))
    ext.injectResolutionRule(sp => new GovernanceRule(sp))
    ext.injectParser((sp, delegate) => new QualifyParser(delegate, Some(sp)))
  }
}
