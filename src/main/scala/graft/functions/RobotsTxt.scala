package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** robots_allowed(robots_txt string, agent string, path string) →
  * boolean — RFC 9309 robots-exclusion evaluation, the governance
  * gate a responsible crawl pipeline applies before a URL's content
  * enters a corpus (and re-applies when policies change after the
  * fact — which is why it is a QUERY operator, not just a crawler
  * concern):
  *
  *  - group selection: the group whose User-agent token (lowercased)
  *    is the LONGEST substring of the crawler's product token wins;
  *    `*` applies only when no specific group matches; multiple
  *    consecutive User-agent lines share one group (RFC 9309 §2.2.1);
  *  - rule evaluation: most-specific (longest-pattern) match wins,
  *    ALLOW wins length ties (§2.2.2); `*` wildcards and the `$`
  *    end-anchor are honored; an empty Disallow value is no rule;
  *    no matching rule → allowed;
  *  - lines are comment-stripped (#), keys case-insensitive,
  *    unknown keys skipped — hostile/garbage robots.txt degrades to
  *    permissive exactly as the RFC prescribes ("crawlers MUST use
  *    the parseable lines").
  *
  * NULL inputs → NULL. A missing robots.txt is the caller's concern
  * (pass NULL or ''; the empty string allows everything). Per-row
  * scalar, zero shuffle at any scale.
  */
case class RobotsAllowedExpr(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "robots_allowed"
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.forall(_.dataType == StringType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects (robots string, agent string, path string)")

  override def nullSafeEval(r: Any, a: Any, p: Any): Any =
    RobotsTxt.allowed(r.asInstanceOf[UTF8String].toString,
      a.asInstanceOf[UTF8String].toString,
      p.asInstanceOf[UTF8String].toString)

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    nullSafeCodeGen(ctx, ev, (r, a, p) => s"""
      ${ev.value} = graft.functions.RobotsTxt.allowed(
        $r.toString(), $a.toString(), $p.toString());""")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object RobotsTxt {

  private final case class Group(agents: Vector[String],
      rules: Vector[(Boolean, String)])

  /** Parse groups: consecutive User-agent lines open a group; rule
    * lines bind to the open group; rules before any User-agent line
    * are ignored (no group to bind to, per the RFC's grammar). */
  private def parse(robots: String): Vector[Group] = {
    val groups = Vector.newBuilder[Group]
    var agents = Vector.empty[String]
    var rules = Vector.empty[(Boolean, String)]
    var collectingAgents = false
    def close(): Unit = {
      if (agents.nonEmpty) groups += Group(agents, rules)
      agents = Vector.empty
      rules = Vector.empty
    }
    robots.split("\r?\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      if (line.nonEmpty) {
        val colon = line.indexOf(':')
        if (colon > 0) {
          val key = line.substring(0, colon).trim
            .toLowerCase(java.util.Locale.ROOT)
          val value = line.substring(colon + 1).trim
          key match {
            case "user-agent" =>
              if (!collectingAgents) { close(); collectingAgents = true }
              agents :+= value.toLowerCase(java.util.Locale.ROOT)
            case "allow" | "disallow" =>
              collectingAgents = false
              if (agents.nonEmpty && (value.nonEmpty || key == "allow"))
                // an empty Disallow is "no rule" (allows everything);
                // an empty Allow pattern matches nothing and is inert
                if (value.nonEmpty) rules :+= (key == "allow", value)
            case _ => // sitemap / crawl-delay / unknown: not path rules
              collectingAgents = false
          }
        }
      }
    }
    close()
    groups.result()
  }

  /** RFC 9309 path-pattern match: `*` spans anything, a trailing `$`
    * anchors the end. Iterative greedy-with-backtrack (no regex —
    * hostile patterns must stay linear-ish). */
  private[functions] def patternMatches(pattern: String, path: String): Boolean = {
    var pat = pattern
    var anchored = false
    if (pat.endsWith("$")) { anchored = true; pat = pat.substring(0, pat.length - 1) }
    var pi = 0
    var si = 0
    var starPi = -1
    var starSi = -1
    while (si < path.length) {
      // pattern exhausted mid-path: an UNANCHORED robots pattern is a
      // prefix match and succeeds right here (before any backtracking)
      if (pi == pat.length && !anchored) return true
      if (pi < pat.length && (pat.charAt(pi) == path.charAt(si))) {
        pi += 1; si += 1
      } else if (pi < pat.length && pat.charAt(pi) == '*') {
        starPi = pi; starSi = si; pi += 1
      } else if (starPi >= 0) {
        starSi += 1; si = starSi; pi = starPi + 1
      } else {
        return false
      }
    }
    while (pi < pat.length && pat.charAt(pi) == '*') pi += 1
    pi == pat.length // path exhausted: pattern must be exhausted too
  }

  /** The RFC 9309 verdict for (robots body, crawler token, path). */
  def allowed(robots: String, agent: String, path: String): Boolean = {
    if (robots == null || robots.isEmpty) return true
    val groups = parse(robots)
    if (groups.isEmpty) return true
    val token = agent.toLowerCase(java.util.Locale.ROOT)
    // longest specific agent substring wins; '*' only as fallback
    var best: Group = null
    var bestLen = -1
    var star: Group = null
    groups.foreach { g =>
      g.agents.foreach { a =>
        if (a == "*") { if (star == null) star = g }
        else if (token.contains(a) && a.length > bestLen) {
          best = g; bestLen = a.length
        }
      }
    }
    val group = if (best != null) best else star
    if (group == null) return true
    // most specific rule: longest pattern; allow wins ties
    var verdict = true // no matching rule → allowed
    var matchedLen = -1
    var matchedAllow = false
    group.rules.foreach { case (allow, pat) =>
      if (patternMatches(pat, path)) {
        if (pat.length > matchedLen ||
            (pat.length == matchedLen && allow && !matchedAllow)) {
          matchedLen = pat.length
          matchedAllow = allow
          verdict = allow
        }
      }
    }
    verdict
  }
}
