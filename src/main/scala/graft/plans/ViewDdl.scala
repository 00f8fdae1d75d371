package graft.plans

/** Native SQL spelling for persisted-catalog-view DDL.
  *
  * The reference's own view DDL (`demo-setup/performance-tests/
  * performance_comparison.sql:24-34`) is
  * `CREATE OR REPLACE VIEW user_activity_summary AS SELECT …` — but stock
  * Spark 4.1's `ResolveSessionCatalog` refuses `CREATE VIEW` on a v2
  * catalog (probed; see [[GraftViewRule]]), so until round 16 graft view
  * DDL could only be typed as `CALL graft.system.create_view(...)`. This
  * desugar closes the spelling gap the same way QUALIFY did
  * ([[Qualify]]): the extension parser rewrites
  *
  * {{{ CREATE [OR REPLACE] VIEW cat.ns.v AS <body> }}}
  *
  * into the procedure call
  *
  * {{{ CALL cat.system.create_view(view => 'ns.v', sql_text => '<body>',
  *     replace => true|false) }}}
  *
  * and `DROP VIEW [IF EXISTS] cat.ns.v` into `CALL cat.system.drop_view`.
  * Everything create_view enforces — full qualification of every table
  * reference (CTE-scoped), self-reference refusal, analysis-time
  * validation — applies unchanged: the spelling is sugar over the one
  * validated path, so the two surfaces cannot drift.
  *
  * The rewrite fires only when the view identifier has ≥3 parts AND its
  * first part names a registered [[graft.table.GraftCatalog]] in the
  * session (checked via the `isGraftCatalog` callback) — 1/2-part names,
  * TEMPORARY/GLOBAL views, `IF NOT EXISTS`, and column-list forms all
  * pass through untouched to stock Spark, whose behavior for them is
  * already correct (session-catalog views work; v2-catalog forms get
  * Spark's own refusal). `DROP VIEW` carries standard semantics through
  * the desugar: the plain spelling passes `if_exists => false` (a
  * missing graft view RAISES, matching Spark/ANSI), `IF EXISTS` passes
  * `true` (idempotent no-op).
  */
object ViewDdl {

  // Statement-anchored, case-insensitive, dot-all (view bodies span
  // lines). Identifier: plain or backquoted segments joined by dots; a
  // column list or TEMPORARY/GLOBAL/IF NOT EXISTS keyword makes the
  // pattern not match → pass-through by construction.
  // backquoted segments admit Spark's doubled-backquote escape
  // (`v``x` names v`x — parts() unescapes)
  private val Seg = """(?:`(?:[^`]|``)+`|\w+)"""
  private val CreateRe =
    ("""(?is)^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+""" +
      s"""($Seg(?:\\s*\\.\\s*$Seg){2,})\\s+AS\\s+(.+)$$""").r
  private val DropRe =
    ("""(?is)^\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?""" +
      s"""($Seg(?:\\s*\\.\\s*$Seg){2,})\\s*;?\\s*$$""").r

  // split on dots OUTSIDE backquotes (a quoted segment may contain `.`),
  // then strip the quotes per segment
  private def parts(ident: String): Seq[String] = {
    val segs = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQuote = false
    ident.foreach {
      case '`' => inQuote = !inQuote; cur += '`'
      case '.' if !inQuote => segs += cur.result(); cur.clear()
      case c => cur += c
    }
    segs += cur.result()
    segs.toSeq.map(_.trim).map { seg =>
      if (seg.startsWith("`") && seg.endsWith("`") && seg.length >= 2)
        // Spark's doubled-backquote escape: `v``x` names v`x
        seg.substring(1, seg.length - 1).replace("``", "`")
      else seg
    }
  }

  /** Single-quote `s` so the generated CALL re-parses to exactly `s`.
    * Quotes double ('' is an escaped quote in Spark's lexer — probed);
    * backslashes double too, because the default lexer escape-processes
    * them (`\d` typed in a view body would otherwise be CONSUMED on the
    * re-parse and the stored definition would silently differ from what
    * the user wrote). Under the legacy
    * `spark.sql.parser.escapedStringLiterals=true` mode backslashes are
    * literal, so only quotes need doubling there. */
  private def quote(s: String): String = {
    val legacyLiterals =
      try org.apache.spark.sql.internal.SQLConf.get.escapedStringLiterals
      catch { case _: Throwable => false }
    val bs = if (legacyLiterals) s else s.replace("\\", "\\\\")
    "'" + bs.replace("'", "''") + "'"
  }

  /** The procedure's `view` argument is dot-separated (`split('.')` on
    * the other side), so a backquoted segment CONTAINING a dot cannot
    * round-trip — refuse loudly rather than create/drop a different
    * identifier than the user named. */
  private def joinTail(p: Seq[String], verb: String): String = {
    p.tail.find(_.contains('.')).foreach { seg =>
      throw new IllegalArgumentException(
        s"$verb: backquoted identifier segment `$seg` contains '.', which " +
          "the create_view/drop_view procedures' dot-separated view " +
          "argument cannot represent — rename the view or namespace")
    }
    p.tail.mkString(".")
  }

  /** Rewrite graft-catalog view DDL to its procedure call; anything else
    * passes through byte-identical. */
  def desugar(sql: String, isGraftCatalog: String => Boolean): String =
    sql match {
      case CreateRe(orReplace, ident, body) =>
        val p = parts(ident)
        if (!isGraftCatalog(p.head)) sql
        else {
          val replace = orReplace != null
          s"CALL ${p.head}.system.create_view(view => ${quote(joinTail(p, "CREATE VIEW"))}, " +
            s"sql_text => ${quote(body.trim.stripSuffix(";"))}, replace => $replace)"
        }
      case DropRe(ifExists, ident) =>
        val p = parts(ident)
        if (!isGraftCatalog(p.head)) sql
        else
          // IF EXISTS threads through: plain DROP VIEW on a missing graft
          // view raises (standard SQL), IF EXISTS drops idempotently
          s"CALL ${p.head}.system.drop_view(view => ${quote(joinTail(p, "DROP VIEW"))}, " +
            s"if_exists => ${ifExists != null})"
      case _ => sql
    }
}
