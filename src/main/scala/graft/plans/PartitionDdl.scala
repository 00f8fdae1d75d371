package graft.plans

/** Native SQL spelling for partition spec evolution — Apache Iceberg's
  * own ALTER TABLE extension syntax (the spellings Iceberg's Spark SQL
  * extensions add, which stock Spark cannot parse):
  *
  * {{{ ALTER TABLE cat.ns.t ADD PARTITION FIELD days(ts) }}}
  * {{{ ALTER TABLE cat.ns.t DROP PARTITION FIELD bucket(16, user_id) }}}
  * {{{ ALTER TABLE cat.ns.t REPLACE PARTITION FIELD days(ts) WITH hours(ts) }}}
  *
  * Each desugars to `CALL cat.system.set_partition_spec(table => 'ns.t',
  * add => …, drop => …)` — one atomic metadata-only commit through the
  * SAME validated path as the procedure and the
  * `SnapshotTable.setPartitionSpec` API ([[graft.table.Procedures]]), so
  * the three surfaces cannot drift. REPLACE is drop+add in ONE commit.
  *
  * Fires only when the table identifier has ≥3 parts AND its first part
  * names a registered [[graft.table.GraftCatalog]] (the
  * `isGraftCatalog` callback, shared with [[ViewDdl]]); everything else
  * passes through byte-identical — in particular plain
  * `ALTER TABLE … ADD PARTITION (…)` (Hive partition DDL, no FIELD
  * keyword) never matches. Transform arguments pass through verbatim;
  * validation (column existence, transform/source types, duplicates)
  * happens in `setPartitionSpec` where all spellings meet it.
  */
object PartitionDdl {

  private val Seg = """(?:`(?:[^`]|``)+`|\w+)"""
  private val Ident = s"$Seg(?:\\s*\\.\\s*$Seg){2,}"
  // a transform: word, or word(args) — args never nest parens
  private val Field = """\w+\s*(?:\([^()]*\))?"""
  private val AddRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident)\\s+ADD\\s+PARTITION\\s+""" +
      s"""FIELD\\s+($Field)\\s*;?\\s*$$""").r
  private val DropRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident)\\s+DROP\\s+PARTITION\\s+""" +
      s"""FIELD\\s+($Field)\\s*;?\\s*$$""").r
  private val ReplaceRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident)\\s+REPLACE\\s+PARTITION\\s+""" +
      s"""FIELD\\s+($Field)\\s+WITH\\s+($Field)\\s*;?\\s*$$""").r
  // Iceberg's write-order spellings: ORDERED BY a[, b…] (with or without
  // parens; plain identity columns) / UNORDERED — desugared to the
  // write.sort-order table property the staged write path reads
  // Parens must balance (two alternates: parenthesized list OR bare
  // list) — `BY (a, b` / `BY a)` must NOT silently desugar to SET
  // TBLPROPERTIES; they fall through to stock Spark's parse error.
  private val OrderedRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident)\\s+WRITE\\s+ORDERED\\s+BY\\s+""" +
      """(?:\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)|(\w+(?:\s*,\s*\w+)*))\s*;?\s*$""").r
  // direction / null-order modifiers (Iceberg's `ORDERED BY a DESC NULLS
  // LAST`) are recognized so the refusal is targeted, not stock Spark's
  // generic parse error
  private val OrderedModifierRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident)\\s+WRITE\\s+ORDERED\\s+BY\\s+""" +
      """.*\b(?:ASC|DESC|NULLS)\b.*$""").r
  private val UnorderedRe =
    (s"""(?is)^\\s*ALTER\\s+TABLE\\s+($Ident)\\s+WRITE\\s+UNORDERED\\s*;?\\s*$$""").r

  // identifier split/unquote and the dotted-segment refusal, shared with
  // the view DDL desugar's rules (same procedure-side split('.'))
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
        seg.substring(1, seg.length - 1).replace("``", "`")
      else seg
    }
  }

  private def call(p: Seq[String], args: String): String = {
    p.tail.find(_.contains('.')).foreach { seg =>
      throw new IllegalArgumentException(
        s"ALTER TABLE … PARTITION FIELD: backquoted identifier segment " +
          s"`$seg` contains '.', which the set_partition_spec procedure's " +
          "dot-separated table argument cannot represent")
    }
    s"CALL ${p.head}.system.set_partition_spec(" +
      s"table => '${p.tail.mkString(".")}', $args)"
  }

  private def lit(s: String): String =
    "'" + s.trim.replace("'", "''") + "'"

  /** Rewrite graft-catalog partition-field DDL to its procedure call;
    * anything else passes through byte-identical. */
  def desugar(sql: String, isGraftCatalog: String => Boolean): String =
    sql match {
      case AddRe(ident, f) =>
        val p = parts(ident)
        if (!isGraftCatalog(p.head)) sql
        else call(p, s"add => ${lit(f)}")
      case DropRe(ident, f) =>
        val p = parts(ident)
        if (!isGraftCatalog(p.head)) sql
        else call(p, s"drop => ${lit(f)}")
      case ReplaceRe(ident, from, to) =>
        val p = parts(ident)
        if (!isGraftCatalog(p.head)) sql
        else call(p, s"add => ${lit(to)}, drop => ${lit(from)}")
      case OrderedModifierRe(ident) if isGraftCatalog(parts(ident).head) =>
        throw new IllegalArgumentException(
          "WRITE ORDERED BY supports plain ascending identity columns " +
            "only; direction/null-order modifiers (ASC/DESC/NULLS " +
            "FIRST/LAST) are not supported")
      case OrderedRe(ident, parenCols, bareCols) =>
        // `ident` re-emits VERBATIM (backquoting preserved) — only the
        // catalog part is inspected
        if (!isGraftCatalog(parts(ident).head)) sql
        else {
          val cols = Option(parenCols).getOrElse(bareCols)
          val list = cols.split(",").map(_.trim).filter(_.nonEmpty)
            .mkString(",")
          s"ALTER TABLE $ident SET TBLPROPERTIES " +
            s"('write.sort-order' = ${lit(list)})"
        }
      case UnorderedRe(ident) =>
        if (!isGraftCatalog(parts(ident).head)) sql
        else s"ALTER TABLE $ident UNSET TBLPROPERTIES ('write.sort-order')"
      case _ => sql
    }
}
