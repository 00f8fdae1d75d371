package graft.table

import graft.SparkFunSuite
import org.apache.spark.sql.SparkSession

/** Persisted catalog views: procedure DDL (`CALL graft.system.create_view
  * / drop_view`), resolution through [[graft.plans.GraftViewRule]] on an
  * extension session, fresh-session persistence, and the live-replanning
  * contract (a view over a graft table tracks subsequent appends). Stock
  * Spark's own `CREATE VIEW` refuses v2 catalogs (probed — see
  * GraftViewRule scaladoc), which is why DDL rides the procedure surface.
  */
class ViewCatalogSpec extends SparkFunSuite {

  private def extSession(): SparkSession = {
    val shared = graft.SparkSuite.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-views")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(s)
    s.conf.set("spark.sql.catalog.graft", classOf[GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.graft.warehouse",
      graft.Tables.scratch("warehouse/graft-catalog"))
    graft.plans.Governance.clearPolicies()
    graft.plans.Governance.setPrivileged(s, true)
    s
  }

  test("create_view / read / replace / drop; persists into a fresh catalog instance") {
    val s = extSession()
    s.sql("CALL graft.system.drop_view(view => 'db.v_spec')")
    s.sql("CREATE TABLE IF NOT EXISTS graft.db.v_base (id BIGINT, v DOUBLE)")
    s.sql("DELETE FROM graft.db.v_base WHERE true")
    s.sql("INSERT INTO graft.db.v_base VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    s.sql("CALL graft.system.create_view(view => 'db.v_spec', " +
      "sql_text => 'SELECT id, v * 2 AS dv FROM graft.db.v_base WHERE id > 1')")
    assert(s.sql("SELECT * FROM graft.db.v_spec").count() == 2)
    assert(s.sql("SELECT sum(dv) AS s FROM graft.db.v_spec").head.getDouble(0) == 12.0)
    // live replanning: the view tracks base-table appends
    s.sql("INSERT INTO graft.db.v_base VALUES (4, 4.5)")
    assert(s.sql("SELECT * FROM graft.db.v_spec").count() == 3)
    // replace changes the definition
    s.sql("CALL graft.system.create_view(view => 'db.v_spec', " +
      "sql_text => 'SELECT id FROM graft.db.v_base', replace => true)")
    assert(s.sql("SELECT * FROM graft.db.v_spec").columns.toSeq == Seq("id"))
    // a FRESH catalog instance (new session) still resolves it
    val s2 = extSession()
    assert(s2.sql("SELECT * FROM graft.db.v_spec").count() == 4)
    assert(s2.sql("SELECT * FROM graft.db.v_spec").columns.toSeq == Seq("id"))
    s.sql("CALL graft.system.drop_view(view => 'db.v_spec')")
    intercept[Exception] { s2.sql("SELECT * FROM graft.db.v_spec").collect() }
  }

  test("identifiers are case-insensitive: create V_Daily, read v_daily") {
    val s = extSession()
    s.sql("CALL graft.system.create_view(view => 'db.V_Daily', " +
      "sql_text => 'SELECT id FROM graft.db.v_base', replace => true)")
    assert(s.sql("SELECT * FROM graft.db.v_daily").columns.toSeq == Seq("id"))
    assert(s.sql("SELECT * FROM graft.db.V_DAILY").count() ==
      s.sql("SELECT * FROM graft.db.v_base").count())
    s.sql("CALL graft.system.drop_view(view => 'db.v_daily')")
    intercept[Exception] { s.sql("SELECT * FROM graft.db.V_Daily").collect() }
  }

  test("unqualified references and self-references refuse at CREATE time") {
    val s = extSession()
    // temp view would satisfy the creator's analysis but break every reader
    graft.Tables.load(s, sf, "events").createOrReplaceTempView("tmp_events")
    val unq = intercept[Exception] {
      s.sql("CALL graft.system.create_view(view => 'db.v_unq', " +
        "sql_text => 'SELECT count(*) AS n FROM tmp_events')")
    }
    assert(unq.getMessage.contains("fully qualified"), unq.getMessage)
    // replace-with-self-reference: the analysis check alone would resolve
    // the self-ref against the OLD definition and "validate" it
    s.sql("CALL graft.system.create_view(view => 'db.v_rs', " +
      "sql_text => 'SELECT id FROM graft.db.v_base', replace => true)")
    val self = intercept[Exception] {
      s.sql("CALL graft.system.create_view(view => 'db.v_rs', " +
        "sql_text => 'SELECT id FROM graft.db.v_rs WHERE id > 0', replace => true)")
    }
    assert(self.getMessage.contains("references itself"), self.getMessage)
    // the OLD definition survived the refused replace
    assert(s.sql("SELECT * FROM graft.db.v_rs").columns.toSeq == Seq("id"))
    s.sql("CALL graft.system.drop_view(view => 'db.v_rs')")
  }

  test("CTE-bearing definitions persist, resolve in a fresh session, and replan live") {
    val s = extSession()
    s.sql("CALL graft.system.drop_view(view => 'db.v_cte')")
    s.sql("CREATE TABLE IF NOT EXISTS graft.db.v_base (id BIGINT, v DOUBLE)")
    s.sql("DELETE FROM graft.db.v_base WHERE true")
    s.sql("INSERT INTO graft.db.v_base VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    // a CTE reference is a 1-part relation at parse time but is
    // self-contained in the stored text — must NOT be refused as
    // unqualified (the reference's own dominant query shape)
    s.sql("CALL graft.system.create_view(view => 'db.v_cte', sql_text => " +
      "'WITH recent AS (SELECT id, v FROM graft.db.v_base WHERE id > 1), " +
      "agg AS (SELECT count(*) AS n, sum(v) AS sv FROM recent) " +
      "SELECT n, sv FROM agg')")
    assert(s.sql("SELECT n FROM graft.db.v_cte").head.getLong(0) == 2)
    // live replanning across the CTE body
    s.sql("INSERT INTO graft.db.v_base VALUES (4, 4.5)")
    assert(s.sql("SELECT n FROM graft.db.v_cte").head.getLong(0) == 3)
    // a fresh catalog instance re-parses the stored CTE text
    val s2 = extSession()
    assert(s2.sql("SELECT n FROM graft.db.v_cte").head.getLong(0) == 3)
    // but a genuinely-unqualified relation NEXT TO a CTE still refuses
    val e = intercept[Exception] {
      s.sql("CALL graft.system.create_view(view => 'db.v_cte2', sql_text => " +
        "'WITH recent AS (SELECT id FROM graft.db.v_base) " +
        "SELECT * FROM recent JOIN other_table USING (id)')")
    }
    assert(e.getMessage.contains("fully qualified"), e.getMessage)
    // ...and a CTE named after ITSELF does not smuggle one in: in a plain
    // (non-RECURSIVE) WITH, the inner same-name reference resolves against
    // the OUTER scope — e.g. the creator's temp view — so it is an
    // unqualified real reference, not a CTE reference
    graft.Tables.load(s, sf, "events").createOrReplaceTempView("tmp_ev2")
    val trick = intercept[Exception] {
      s.sql("CALL graft.system.create_view(view => 'db.v_cte3', sql_text => " +
        "'WITH tmp_ev2 AS (SELECT user_id FROM tmp_ev2) " +
        "SELECT count(*) AS n FROM tmp_ev2')")
    }
    assert(trick.getMessage.contains("fully qualified"), trick.getMessage)
    s.sql("CALL graft.system.drop_view(view => 'db.v_cte')")
  }

  test("WITH RECURSIVE view bodies round-trip through the read path") {
    val s = extSession()
    s.sql("CALL graft.system.create_view(view => 'db.v_rec', replace => true, " +
      "sql_text => 'WITH RECURSIVE seq (n) AS (SELECT 1 UNION ALL " +
      "SELECT n + 1 FROM seq WHERE n < 5) SELECT max(n) AS m FROM seq')")
    assert(s.sql("SELECT m FROM graft.db.v_rec").head.getInt(0) == 5)
    s.sql("CALL graft.system.drop_view(view => 'db.v_rec')")
  }

  test("subquery expressions are validated: unqualified and self refs refuse") {
    val s = extSession()
    graft.Tables.load(s, sf, "events").createOrReplaceTempView("tmp_events")
    // unqualified relation INSIDE an IN-subquery: the creator's analysis
    // would resolve the temp view and persist a view broken for every
    // other reader — must refuse statically
    val unq = intercept[Exception] {
      s.sql("CALL graft.system.create_view(view => 'db.v_sq', sql_text => " +
        "'SELECT id FROM graft.db.v_base WHERE id IN " +
        "(SELECT user_id FROM tmp_events)')")
    }
    assert(unq.getMessage.contains("fully qualified"), unq.getMessage)
    // self-reference hidden in a scalar subquery under replace
    s.sql("CALL graft.system.create_view(view => 'db.v_sq', " +
      "sql_text => 'SELECT id FROM graft.db.v_base', replace => true)")
    val self = intercept[Exception] {
      s.sql("CALL graft.system.create_view(view => 'db.v_sq', sql_text => " +
        "'SELECT id FROM graft.db.v_base WHERE id < " +
        "(SELECT max(id) FROM graft.db.v_sq)', replace => true)")
    }
    assert(self.getMessage.contains("references itself"), self.getMessage)
    // the OLD definition survived both refused writes
    assert(s.sql("SELECT * FROM graft.db.v_sq").columns.toSeq == Seq("id"))
    s.sql("CALL graft.system.drop_view(view => 'db.v_sq')")
  }

  test("a view may not shadow an existing table; namespace casing is one store") {
    val s = extSession()
    val shadow = intercept[Exception] {
      s.sql("CALL graft.system.create_view(view => 'db.v_base', " +
        "sql_text => 'SELECT 1 AS one', replace => true)")
    }
    assert(shadow.getMessage.contains("names a TABLE"), shadow.getMessage)
    // namespace segments are case-normalized: DB.v_ns and db.v_ns are the
    // same document on every filesystem
    s.sql("CALL graft.system.create_view(view => 'DB.v_ns', " +
      "sql_text => 'SELECT id FROM graft.db.v_base', replace => true)")
    assert(s.sql("SELECT * FROM graft.db.v_ns").columns.toSeq == Seq("id"))
    s.sql("CALL graft.system.drop_view(view => 'db.v_ns')")
    intercept[Exception] { s.sql("SELECT * FROM graft.DB.v_ns").collect() }
  }

  test("native CREATE [OR REPLACE] VIEW / DROP VIEW spelling desugars to the procedures") {
    val s = extSession()
    s.sql("CREATE TABLE IF NOT EXISTS graft.db.v_base (id BIGINT, v DOUBLE)")
    s.sql("DELETE FROM graft.db.v_base WHERE true")
    s.sql("INSERT INTO graft.db.v_base VALUES (1, 1.5), (2, 2.5), (3, 3.5)")
    s.sql("CALL graft.system.drop_view(view => 'db.v_native')")
    // the reference's own DDL spelling (performance_comparison.sql:24-34),
    // typed verbatim against the graft catalog — multi-line, CTE-bearing
    s.sql(
      """CREATE VIEW graft.db.v_native AS
        |WITH recent AS (SELECT id, v FROM graft.db.v_base WHERE id > 1)
        |SELECT count(*) AS n, sum(v) AS sv FROM recent""".stripMargin)
    assert(s.sql("SELECT n FROM graft.db.v_native").head.getLong(0) == 2)
    // plain CREATE on an existing view refuses (no OR REPLACE)
    intercept[Exception] {
      s.sql("CREATE VIEW graft.db.v_native AS SELECT id FROM graft.db.v_base")
    }
    // OR REPLACE swaps the definition
    s.sql("CREATE OR REPLACE VIEW graft.db.v_native AS " +
      "SELECT id FROM graft.db.v_base")
    assert(s.sql("SELECT * FROM graft.db.v_native").columns.toSeq == Seq("id"))
    assert(s.sql("SELECT * FROM graft.db.v_native").count() == 3)
    s.sql("DROP VIEW graft.db.v_native")
    intercept[Exception] { s.sql("SELECT * FROM graft.db.v_native").collect() }
    // IF EXISTS on a missing view is a no-op, not an error…
    s.sql("DROP VIEW IF EXISTS graft.db.v_native")
    // …while plain DROP VIEW on a missing view RAISES (standard SQL —
    // the desugar threads if_exists=false through to the procedure)
    val missing = intercept[Exception] {
      s.sql("DROP VIEW graft.db.v_native")
    }
    assert(missing.getMessage.contains("does not exist"), missing.getMessage)
    // backquoted segments parse through the desugar too
    s.sql("CREATE OR REPLACE VIEW graft.`db`.`v_bq` AS " +
      "SELECT id FROM graft.db.v_base")
    assert(s.sql("SELECT * FROM graft.db.v_bq").columns.toSeq == Seq("id"))
    s.sql("DROP VIEW graft.db.`v_bq`")
    intercept[Exception] { s.sql("SELECT * FROM graft.db.v_bq").collect() }
    // Spark's doubled-backquote escape unescapes through the desugar:
    // `v``q` names v`q on BOTH the create and the drop side (the same
    // identifier everywhere else in Spark)
    s.sql("CREATE OR REPLACE VIEW graft.db.`v``q` AS " +
      "SELECT id FROM graft.db.v_base")
    assert(s.sql("SELECT * FROM graft.db.`v``q`").count() == 3)
    s.sql("DROP VIEW graft.db.`v``q`")
    intercept[Exception] { s.sql("SELECT * FROM graft.db.`v``q`").collect() }
    // a body containing BACKSLASH escapes survives the desugar's
    // re-quoting exactly: the stored definition must keep the \d the
    // user typed (a quote() that only doubled single quotes would let
    // the generated CALL's re-parse CONSUME the backslash, silently
    // storing a different regex)
    s.sql("""CREATE OR REPLACE VIEW graft.db.v_bs AS
      |SELECT regexp_replace(CAST(id AS STRING), '\\d', 'N') AS r
      |FROM graft.db.v_base""".stripMargin)
    assert(s.sql("SELECT r FROM graft.db.v_bs ORDER BY r").collect()
      .map(_.getString(0)).toSeq == Seq("N", "N", "N"))
    s.sql("DROP VIEW graft.db.v_bs")
    // a backquoted segment CONTAINING a dot cannot round-trip through
    // the procedure's dot-separated view argument — refused loudly,
    // not silently re-split into a different identifier
    val dotted = intercept[Exception] {
      s.sql("CREATE OR REPLACE VIEW graft.db.`v.dot` AS " +
        "SELECT id FROM graft.db.v_base")
    }
    assert(dotted.getMessage.contains("contains '.'"), dotted.getMessage)
  }

  test("native spelling still refuses unqualified bodies; non-graft DDL passes through") {
    val s = extSession()
    graft.Tables.load(s, sf, "events").createOrReplaceTempView("tmp_nat")
    // the desugar routes through create_view, so the static qualification
    // check applies to the native spelling identically
    val e = intercept[Exception] {
      s.sql("CREATE OR REPLACE VIEW graft.db.v_natq AS " +
        "SELECT count(*) AS n FROM tmp_nat")
    }
    assert(e.getMessage.contains("fully qualified"), e.getMessage)
    intercept[Exception] { s.sql("SELECT * FROM graft.db.v_natq").collect() }
    // 1-part names keep stock Spark behavior: a session-catalog temp view
    s.sql("CREATE OR REPLACE TEMPORARY VIEW v_session_tmp AS SELECT 1 AS one")
    assert(s.sql("SELECT one FROM v_session_tmp").head.getInt(0) == 1)
    s.catalog.dropTempView("v_session_tmp")
    // a 3-part name whose catalog is NOT a GraftCatalog passes through to
    // stock Spark (which refuses v2-catalog CREATE VIEW itself) — the
    // desugar must not have swallowed the statement into a bogus CALL
    val notGraft = intercept[Exception] {
      s.sql("CREATE VIEW spark_catalog.nodb.v_x AS SELECT 1 AS one")
    }
    assert(!notGraft.getMessage.contains("create_view"), notGraft.getMessage)
  }

  test("create_view validates the definition at create time, not first read") {
    val s = extSession()
    val e = intercept[Exception] {
      s.sql("CALL graft.system.create_view(view => 'db.v_bad', " +
        "sql_text => 'SELECT no_such_col FROM graft.db.v_base')")
    }
    assert(e.getMessage.contains("no_such_col"), e.getMessage)
    // nothing persisted
    intercept[Exception] { s.sql("SELECT * FROM graft.db.v_bad").collect() }
  }

  test("views compose: a view over a view resolves; direct self-reference refuses") {
    val s = extSession()
    s.sql("CALL graft.system.create_view(view => 'db.v_a', " +
      "sql_text => 'SELECT id FROM graft.db.v_base WHERE id > 1', replace => true)")
    s.sql("CALL graft.system.create_view(view => 'db.v_b', " +
      "sql_text => 'SELECT count(*) AS n FROM graft.db.v_a', replace => true)")
    assert(s.sql("SELECT n FROM graft.db.v_b").head.getLong(0) >= 2)
    // direct self-reference: the rule refuses instead of looping
    val cat = s.sessionState.catalogManager.catalog("graft")
      .asInstanceOf[GraftCatalog]
    import org.apache.spark.sql.connector.catalog.{Identifier, ViewInfo}
    cat.dropView(Identifier.of(Array("db"), "v_self"))
    cat.createView(new ViewInfo(Identifier.of(Array("db"), "v_self"),
      "SELECT * FROM graft.db.v_self", "graft", Array("db"),
      new org.apache.spark.sql.types.StructType(), Array.empty, Array.empty,
      Array.empty, new java.util.HashMap[String, String]()))
    val e = intercept[Exception] {
      s.sql("SELECT * FROM graft.db.v_self").collect()
    }
    assert(e.getMessage.contains("references itself"), e.getMessage)
    s.sql("CALL graft.system.drop_view(view => 'db.v_a')")
    s.sql("CALL graft.system.drop_view(view => 'db.v_b')")
    cat.dropView(Identifier.of(Array("db"), "v_self"))
  }
}
