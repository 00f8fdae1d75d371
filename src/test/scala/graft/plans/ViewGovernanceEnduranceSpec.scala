package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.SparkSession

/** Long-haul interplay probe (VERDICT r19 task 8): 100 persisted
  * catalog views — including view-over-view chains — over ONE evolving
  * governed table, re-read through row + mask policies after every
  * mutation class the table layer supports (append, schema evolution,
  * compaction). Each feature is spec'd alone elsewhere; this pins the
  * RESOLUTION-RULE INTERPLAY: GraftViewRule splices 100 distinct bodies,
  * GovernanceRule must wrap the base scan inside every one of them, and
  * neither compaction (which rewrites files OUTSIDE the session's
  * governed analyzer) nor ADD COLUMN may change what an unprivileged
  * reader sees — or worse, let the policy filter leak into the rewrite
  * and destroy rows.
  */
class ViewGovernanceEnduranceSpec extends SparkFunSuite {

  private def extSession(): SparkSession = {
    val shared = graft.SparkSuite.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-endurance")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(s)
    s
  }

  // per-view expected row count under the segment='A' (even ids) row
  // policy, with `copies` 60-row generations inserted so far: base view
  // k keeps ids ≡ k (mod 10); chained view k mirrors view k-1
  private def expect(k: Int, copies: Int): Long = {
    val m = (if (k % 5 == 4) k - 1 else k) % 10
    if (m % 2 == 0) 6L * copies else 0L
  }

  test("100 views over an evolving governed table: appends, ADD COLUMN, compaction") {
    val s = extSession()
    val wh = scratch("endurance-wh")
    s.conf.set("spark.sql.catalog.endur",
      classOf[graft.table.GraftCatalog].getName)
    s.conf.set("spark.sql.catalog.endur.warehouse", wh)
    Governance.clearPolicies()
    Governance.setPrivileged(s, false)

    def insertGeneration(g: Int, withExtra: Boolean): Unit = {
      val extra = if (withExtra) ", CAST(NULL AS DOUBLE)" else ""
      s.sql(s"""INSERT INTO endur.db.base
        |SELECT id + ${g * 60}, CASE WHEN id % 2 = 0 THEN 'A' ELSE 'B' END,
        |       concat('n', id + ${g * 60}), id / 2.0$extra
        |FROM range(60)""".stripMargin)
    }
    s.sql("CREATE TABLE endur.db.base " +
      "(id BIGINT, segment STRING, name STRING, v DOUBLE)")
    insertGeneration(0, withExtra = false)

    // 100 views: every 5th chains over its predecessor (view-over-view
    // resolution must re-fire the substitution AND re-wrap governance)
    for (k <- 0 until 100) {
      val body =
        if (k % 5 == 4)
          s"SELECT id, segment, name, v FROM endur.db.v_end_${k - 1}"
        else
          s"SELECT id, segment, name, v FROM endur.db.base WHERE id % 10 = ${k % 10}"
      s.sql(s"CALL endur.system.create_view(view => 'db.v_end_$k', " +
        s"sql_text => '$body', replace => true)")
    }
    Governance.addRowPolicy(Governance.RowPolicy("base", "segment = 'A'"))
    Governance.addMaskPolicy(Governance.MaskPolicy("base", "name"))
    try {
      def check(k: Int, copies: Int): Unit = {
        val rows = s.sql(
          s"SELECT id, segment, name FROM endur.db.v_end_$k").collect()
        assert(rows.length == expect(k, copies),
          s"view $k at $copies generations: got ${rows.length}")
        assert(rows.forall(_.getString(1) == "A"), s"row policy leak in view $k")
        assert(rows.forall(_.getString(2) == Governance.Masked),
          s"mask leak in view $k")
        val m = (if (k % 5 == 4) k - 1 else k) % 10
        assert(rows.forall(_.getLong(0) % 10 == m), s"wrong body in view $k")
      }

      // phase 1: every view resolves through policies
      for (k <- 0 until 100) check(k, copies = 1)

      // phase 2: append a second generation — all views replan live
      insertGeneration(1, withExtra = false)
      for (k <- 0 until 100 by 7) check(k, copies = 2)

      // phase 3: schema evolution (ADD COLUMN) + a third generation —
      // the views select explicit columns, so evolution must be invisible
      s.sql("ALTER TABLE endur.db.base ADD COLUMN extra DOUBLE")
      insertGeneration(2, withExtra = true)
      for (k <- 0 until 100 by 7) check(k, copies = 3)

      // phase 4: compaction runs OUTSIDE the governed analyzer — it must
      // rewrite ALL rows (not the policy-filtered view), and every view
      // still resolves identically afterwards
      s.sql("CALL endur.system.compact(table => 'db.base')")
      for (k <- 0 until 100) check(k, copies = 3)

      // the no-row-loss proof: with policies cleared, all 180 rows of
      // every generation survived compaction, names unmasked
      Governance.clearPolicies()
      val full = s.sql(
        "SELECT count(*) AS n, count(DISTINCT name) AS d FROM endur.db.base")
        .head()
      assert(full.getLong(0) == 180L, s"compaction lost rows: $full")
      assert(full.getLong(1) == 180L, s"compaction damaged names: $full")
    } finally {
      Governance.clearPolicies()
      for (k <- 0 until 100)
        s.sql(s"CALL endur.system.drop_view(view => 'db.v_end_$k')")
    }
  }
}
