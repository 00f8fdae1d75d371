package graft.functions

import graft.SparkFunSuite
import org.apache.spark.sql.functions._

/** Char-trigram language identification ([[LangId]] / `trigram_lang`):
  * real-language accuracy on the embedded samples, the CJK rule, the
  * unknown threshold, and codegen-only compilation. */
class LangIdSpec extends SparkFunSuite {
  import spark.implicits._

  test("every embedded real-language sample classifies to its own language") {
    Registry.install(spark)
    val got = LangId.samples.toDF("doc_id", "lang", "text")
      .withColumn("predicted", expr("trigram_lang(text)"))
      .select("lang", "predicted").as[(String, String)].collect()
    got.foreach { case (lang, predicted) =>
      assert(lang == s"real:$predicted",
        s"sample labeled $lang predicted $predicted")
    }
    assert(got.map(_._1.stripPrefix("real:")).distinct.sorted.toSeq ==
      Seq("de", "en", "es", "fr", "zh"))
  }

  test("kernel contract: CJK rule, empty/short text, threshold, tie-break determinism") {
    import org.apache.spark.unsafe.types.UTF8String
    def p(s: String): String = LangId.compute(UTF8String.fromString(s)).toString
    assert(p("mixed latin text 和一个汉字") == "zh") // any CJK char wins
    assert(p("") == "unknown")
    assert(p("ab") == "unknown") // no trigram window
    assert(p("zzzz qqqq xxxx zzzz qqqq xxxx") == "unknown") // below threshold
    // deterministic on repeated evaluation
    val t = "les enfants jouent dans le jardin"
    assert(p(t) == p(t) && p(t) == "fr")
    // uppercase input lowers first
    assert(p("DER SCHNELLE BRAUNE FUCHS SPRINGT ÜBER DEN FAULEN HUND UND RENNT") == "de")
  }

  test("trigram_lang compiles under codegen-only mode (no fallback)") {
    Registry.install(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      val out = Seq("the cat and the hat", "los niños y las niñas")
        .toDF("text").selectExpr("trigram_lang(text) AS l").as[String].collect()
      assert(out.toSeq == Seq("en", "es"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }
}
