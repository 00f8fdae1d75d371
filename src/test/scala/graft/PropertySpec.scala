package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.plans.{Qualify, QueryCompiler}

/** Property-based invariants (ScalaCheck) for the pure transforms and the
  * native expressions. Runs the checker directly (the scalatest bridge
  * artifact is not in the offline cache). */
class PropertySpec extends SparkFunSuite {

  private def check(p: Prop, n: Int = 50): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(n), p)
    assert(res.passed, res.status.toString)
  }

  private val ident: Gen[String] =
    Gen.identifier.suchThat(_.nonEmpty).map(_.take(12))

  test("property: SQL without QUALIFY always passes through unchanged") {
    check(Prop.forAll(ident, ident, Gen.choose(0, 1000)) { (t, c, n) =>
      val sql = s"SELECT $c FROM $t WHERE $c > $n ORDER BY $c LIMIT 10"
      Qualify.desugar(sql) == sql
    })
  }

  test("property: QUALIFY predicate always lands in the outer WHERE") {
    check(Prop.forAll(ident, Gen.choose(1, 99)) { (c, k) =>
      val out = Qualify.desugar(
        s"SELECT $c, row_number() OVER (ORDER BY $c) AS rn FROM t QUALIFY rn <= $k")
      out.contains(s"__qualify WHERE rn <= $k") &&
        !out.toUpperCase.split("__QUALIFY")(1).contains("QUALIFY ")
    })
  }

  test("property: AT(TIMESTAMP => e) rewrite preserves the inner expression") {
    val exprGen = Gen.oneOf(
      "'2024-01-30'",
      "CURRENT_TIMESTAMP()",
      "CURRENT_TIMESTAMP() - INTERVAL 1 DAY",
      "to_timestamp('2024-01-30 00:00:00')")
    check(Prop.forAll(ident, exprGen) { (t, e) =>
      QueryCompiler.compile(s"SELECT * FROM $t AT(TIMESTAMP => $e)") ==
        s"SELECT * FROM $t TIMESTAMP AS OF $e"
    })
  }

  test("property: cosine_sim is symmetric, bounded, and scale-invariant") {
    graft.functions.Registry.install(spark)
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.choose(-10.0, 10.0))
      .suchThat(v => v.exists(math.abs(_) > 1e-3))
    check(Prop.forAll(vecGen, vecGen, Gen.choose(0.5, 4.0)) { (a, b, s) =>
      val df = Seq((a.toArray, b.toArray, a.map(_ * s).toArray)).toDF("a", "b", "a2")
      val row = df.selectExpr(
        "cosine_sim(a, b)", "cosine_sim(b, a)", "cosine_sim(a2, b)").head()
      val (ab, ba, a2b) = (row.getDouble(0), row.getDouble(1), row.getDouble(2))
      ab == ba &&
        ab >= -1.0 - 1e-9 && ab <= 1.0 + 1e-9 &&
        math.abs(ab - a2b) < 1e-9 // positive scaling preserves cosine
    }, n = 20)
  }

  test("property: minhash bands are deterministic with the declared band count") {
    graft.functions.Registry.install(spark)
    import spark.implicits._
    val shingleSet = Gen.nonEmptyListOf(Gen.identifier.map(_.take(8))).map(_.distinct)
    check(Prop.forAll(shingleSet) { sh =>
      val df = Seq((1L, sh), (2L, sh)).toDF("id", "sh")
      val out = df.selectExpr("minhash_bands(sh, 64, 16) AS b")
        .collect().map(_.getSeq[Long](0))
      out(0).length == 16 && out(0) == out(1)
    }, n = 15)
  }
}
