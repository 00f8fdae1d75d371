package graft.plans

import graft.SparkFunSuite
import org.apache.spark.sql.SparkSession

/** G1/G2 enforced through the SparkSessionExtensions-injected
  * Rule[LogicalPlan] — a dedicated session proves the extension path that
  * ad-hoc SQL cannot bypass. */
class GovernanceSpec extends SparkFunSuite {

  private lazy val governed: SparkSession = {
    // getOrCreate() would hand back the shared (extension-less) suite
    // session; clear active/default so a fresh session is instantiated on
    // the same SparkContext with GraftExtensions applied, then restore.
    val shared = graft.SparkSuite.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .appName("graft-governed")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // static conf spark.sql.extensions is ignored when the SparkContext
      // already exists; withExtensions applies programmatically
      .withExtensions(new GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    SparkSession.setDefaultSession(shared)
    SparkSession.setActiveSession(shared)
    s
  }

  test("row policy filters and mask policy blanks through plain SQL") {
    Governance.clearPolicies()
    Governance.setPrivileged(governed, false)
    Governance.addRowPolicy(Governance.RowPolicy("customer", "c_mktsegment = 'BUILDING'"))
    Governance.addMaskPolicy(Governance.MaskPolicy("customer", "c_name"))
    graft.Tables.load(governed, sf, "customer").createOrReplaceTempView("customer")
    val out = governed.sql("SELECT c_custkey, c_name, c_mktsegment FROM customer").collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getString(2) == "BUILDING"))
    assert(out.forall(_.getString(1) == Governance.Masked))
  }

  test("privileged sessions bypass masking but not row policies") {
    Governance.clearPolicies()
    Governance.addRowPolicy(Governance.RowPolicy("customer", "c_mktsegment = 'BUILDING'"))
    Governance.addMaskPolicy(Governance.MaskPolicy("customer", "c_name"))
    Governance.setPrivileged(governed, true)
    try {
      graft.Tables.load(governed, sf, "customer").createOrReplaceTempView("customer")
      val out = governed.sql("SELECT c_custkey, c_name, c_mktsegment FROM customer").collect()
      assert(out.forall(_.getString(2) == "BUILDING"))
      assert(out.exists(_.getString(1) != Governance.Masked))
    } finally Governance.setPrivileged(governed, false)
  }

  test("a derived subquery sharing a policied table's name is left alone") {
    Governance.clearPolicies()
    Governance.addRowPolicy(Governance.RowPolicy("customer", "c_mktsegment = 'BUILDING'"))
    // the policy predicate references c_mktsegment, which this subquery
    // does not have — applying it would fail analysis; the rule must skip
    val out = governed.sql(
      "SELECT x FROM (SELECT id * 2 AS x FROM (SELECT 21 AS id) GROUP BY id) AS customer")
      .collect()
    assert(out.map(_.getInt(0)).toSeq == Seq(42))
  }

  test("policies apply to time-travel reads (VERSION AS OF) by an unprivileged session") {
    Governance.clearPolicies()
    Governance.setPrivileged(governed, false)
    val wh = scratch("gov-tt-wh")
    governed.conf.set("spark.sql.catalog.govtt",
      classOf[graft.table.GraftCatalog].getName)
    governed.conf.set("spark.sql.catalog.govtt.warehouse", wh)
    governed.sql(
      "CREATE TABLE govtt.db.people (id BIGINT, name STRING, segment STRING)")
    governed.sql(
      """INSERT INTO govtt.db.people VALUES
        |(1, 'ada', 'A'), (2, 'bob', 'B'), (3, 'cec', 'A')""".stripMargin)
    val v1 = graft.table.SnapshotTable.load(governed, s"$wh/db/people").latestVersion
    governed.sql("INSERT INTO govtt.db.people VALUES (4, 'dee', 'A')")

    Governance.addRowPolicy(Governance.RowPolicy("people", "segment = 'A'"))
    Governance.addMaskPolicy(Governance.MaskPolicy("people", "name"))

    // current read: policied
    val cur = governed.sql(
      "SELECT id, name, segment FROM govtt.db.people ORDER BY id").collect()
    assert(cur.map(_.getLong(0)).toSeq == Seq(1L, 3L, 4L))
    assert(cur.forall(_.getString(1) == Governance.Masked))

    // TIME-TRAVEL read: the rule injects at resolution, so a VERSION AS OF
    // scan must be policied exactly like the current one — a historical
    // read is not a mask bypass
    val tt = governed.sql(
      s"SELECT id, name, segment FROM govtt.db.people VERSION AS OF $v1 ORDER BY id")
      .collect()
    assert(tt.map(_.getLong(0)).toSeq == Seq(1L, 3L),
      s"row policy not applied to time travel: ${tt.mkString(";")}")
    assert(tt.forall(_.getString(1) == Governance.Masked),
      s"mask not applied to time travel: ${tt.mkString(";")}")

    // privileged session still sees unmasked history (but filtered rows)
    Governance.setPrivileged(governed, true)
    try {
      val priv = governed.sql(
        s"SELECT id, name FROM govtt.db.people VERSION AS OF $v1 ORDER BY id").collect()
      assert(priv.map(_.getString(1)).toSeq == Seq("ada", "cec"))
    } finally Governance.setPrivileged(governed, false)
    Governance.clearPolicies()
  }

  test("policies apply when a policied table is read THROUGH a persisted catalog view") {
    // the bypass shape that made q69 exist for streaming: GraftViewRule
    // splices the stored body, and GovernanceRule must then wrap the
    // base-table scan inside the replanned body — a view read is not a
    // mask bypass (VERDICT r15 task 4)
    Governance.clearPolicies()
    Governance.setPrivileged(governed, false)
    val wh = scratch("gov-vw-wh")
    governed.conf.set("spark.sql.catalog.govvw",
      classOf[graft.table.GraftCatalog].getName)
    governed.conf.set("spark.sql.catalog.govvw.warehouse", wh)
    governed.sql(
      "CREATE TABLE govvw.db.people (id BIGINT, name STRING, segment STRING)")
    governed.sql(
      """INSERT INTO govvw.db.people VALUES
        |(1, 'ada', 'A'), (2, 'bob', 'B'), (3, 'cec', 'A')""".stripMargin)
    // view created BEFORE policies exist (the common real-world order —
    // a view must not freeze the policy state at create time); native
    // DDL spelling so the desugar path is covered under governance too
    governed.sql("CREATE OR REPLACE VIEW govvw.db.v_people AS " +
      "SELECT id, name, segment FROM govvw.db.people WHERE id > 0")
    Governance.addRowPolicy(Governance.RowPolicy("people", "segment = 'A'"))
    Governance.addMaskPolicy(Governance.MaskPolicy("people", "name"))
    try {
      val out = governed.sql(
        "SELECT id, name, segment FROM govvw.db.v_people ORDER BY id").collect()
      assert(out.map(_.getLong(0)).toSeq == Seq(1L, 3L),
        s"row policy not applied through the view: ${out.mkString(";")}")
      assert(out.forall(_.getString(1) == Governance.Masked),
        s"mask not applied through the view: ${out.mkString(";")}")
      // privileged session: unmasked values, rows still filtered
      Governance.setPrivileged(governed, true)
      val priv = governed.sql(
        "SELECT id, name FROM govvw.db.v_people ORDER BY id").collect()
      assert(priv.map(_.getString(1)).toSeq == Seq("ada", "cec"))
    } finally {
      Governance.setPrivileged(governed, false)
      Governance.clearPolicies()
      governed.sql("DROP VIEW govvw.db.v_people")
    }
  }

  test("SQL SET cannot grant privilege — masks stay on") {
    Governance.clearPolicies()
    Governance.setPrivileged(governed, false)
    Governance.addMaskPolicy(Governance.MaskPolicy("customer", "c_name"))
    graft.Tables.load(governed, sf, "customer").createOrReplaceTempView("customer")
    // the old conf-based gate could be flipped by any SQL user; privilege
    // now lives in an API-only registry this SET must not reach
    governed.sql("SET spark.graft.governance.privileged=true")
    try {
      val out = governed.sql("SELECT c_name FROM customer").collect()
      assert(out.forall(_.getString(0) == Governance.Masked))
    } finally governed.sql("RESET spark.graft.governance.privileged")
  }

  test("privilege travels with the session conf (clone behavior), and a guessed token grants nothing") {
    Governance.clearPolicies()
    Governance.addMaskPolicy(Governance.MaskPolicy("customer", "c_name"))
    Governance.setPrivileged(governed, true)
    try {
      // Spark clones sessions for streaming micro-batches by copying the
      // conf; a session carrying the minted token stays privileged
      val clone = governed.newSession()
      clone.conf.set("graft.governance.token",
        governed.conf.get("graft.governance.token"))
      assert(Governance.privileged(clone))
      // but a token an attacker invents is not in the registry
      val attacker = governed.newSession()
      attacker.conf.set("graft.governance.token",
        java.util.UUID.randomUUID().toString)
      assert(!Governance.privileged(attacker))
    } finally Governance.setPrivileged(governed, false)
    assert(!Governance.privileged(governed))
  }

  test("re-privileging a session does not accrete registry tokens") {
    Governance.setPrivileged(governed, false)
    val base = Governance.tokenCount
    Governance.setPrivileged(governed, true)
    try {
      val one = Governance.tokenCount
      assert(one == base + 1)
      // each re-privilege must retire the prior token: a growing registry
      // is unbounded memory AND a pile of forever-valid mask-bypass secrets
      val firstToken = governed.conf.get("graft.governance.token")
      (1 to 5).foreach(_ => Governance.setPrivileged(governed, true))
      assert(Governance.tokenCount == one)
      // and the retired token no longer grants privilege
      val replayer = governed.newSession()
      replayer.conf.set("graft.governance.token", firstToken)
      assert(!Governance.privileged(replayer))
    } finally Governance.setPrivileged(governed, false)
    assert(Governance.tokenCount == base)
  }

  test("policies apply to streaming reads (readStream.table) by an unprivileged session") {
    // Pins the resolution-rule injection point for the STREAMING read
    // path: `readStream.table` resolves to a StreamingRelationV2 leaf
    // under a SubqueryAlias, so GovernanceRule must wrap it exactly like
    // a batch scan — a stream is not a mask bypass, and the enforcement
    // must survive Spark's per-micro-batch session cloning (the clone
    // carries the conf token, see the clone-behavior test below).
    Governance.clearPolicies()
    Governance.setPrivileged(governed, false)
    val wh = scratch("gov-stream-wh")
    governed.conf.set("spark.sql.catalog.govst",
      classOf[graft.table.GraftCatalog].getName)
    governed.conf.set("spark.sql.catalog.govst.warehouse", wh)
    governed.sql(
      "CREATE TABLE govst.db.gpeople (id BIGINT, name STRING, segment STRING)")
    governed.sql(
      """INSERT INTO govst.db.gpeople VALUES
        |(1, 'ada', 'A'), (2, 'bob', 'B'), (3, 'cec', 'A')""".stripMargin)
    Governance.addRowPolicy(Governance.RowPolicy("gpeople", "segment = 'A'"))
    Governance.addMaskPolicy(Governance.MaskPolicy("gpeople", "name"))
    try {
      // the governed rows land in a real executor-side file sink — never
      // a driver-side collect, so what's in the sink is what the policy
      // let THROUGH the stream
      val out = scratch("gov-stream-out")
      governed.readStream.table("govst.db.gpeople")
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", scratch("gov-stream-ckpt"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      val sunk = governed.read.parquet(out)
        .select("id", "name", "segment").orderBy("id").collect()
      assert(sunk.map(_.getLong(0)).toSeq == Seq(1L, 3L),
        s"row policy not applied to streaming read: ${sunk.mkString(";")}")
      assert(sunk.forall(_.getString(1) == Governance.Masked),
        s"mask not applied to streaming read: ${sunk.mkString(";")}")

      // privileged session: same stream shape, unmasked (still filtered)
      Governance.setPrivileged(governed, true)
      val out2 = scratch("gov-stream-out2")
      governed.readStream.table("govst.db.gpeople")
        .writeStream
        .format("parquet")
        .option("path", out2)
        .option("checkpointLocation", scratch("gov-stream-ckpt2"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
      val priv = governed.read.parquet(out2)
        .select("id", "name").orderBy("id").collect()
      assert(priv.map(_.getString(1)).toSeq == Seq("ada", "cec"))
    } finally {
      Governance.setPrivileged(governed, false)
      Governance.clearPolicies()
    }
  }

  test("privilege is per-session, not process-global") {
    Governance.clearPolicies()
    Governance.addMaskPolicy(Governance.MaskPolicy("customer", "c_name"))
    val shared = graft.SparkSuite.spark
    Governance.setPrivileged(governed, true)
    Governance.setPrivileged(shared, false)
    try {
      val open = Governance.secureView(governed, "customer",
        graft.Tables.load(governed, sf, "customer")).select("c_name").head().getString(0)
      val masked = Governance.secureView(shared, "customer",
        graft.Tables.load(shared, sf, "customer")).select("c_name").head().getString(0)
      assert(open != Governance.Masked)
      assert(masked == Governance.Masked)
    } finally Governance.setPrivileged(governed, false)
  }
}
