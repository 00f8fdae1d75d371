package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Char-trigram language identification (the classic n-gram-profile
  * technique of Cavnar & Trenkle '94, reduced to a fixed top-trigram hit
  * fraction so a SQL oracle can replicate it verbatim).
  *
  * Classifier contract — mirrored EXACTLY by the q32 DuckDB oracle
  * (`graft.queries.Llm.q32Sql` interpolates these very profile constants):
  *   1. lowercase the text; any CJK unified ideograph (U+4E00–U+9FFF)
  *      → `zh` (trigram profiles are useless on unsegmented hanzi);
  *   2. take every overlapping 3-char window; no windows → `unknown`;
  *   3. `hits(L)` = windows (with multiplicity) inside language L's
  *      profile — 20 characteristic in-word trigrams per language,
  *      public textbook knowledge, no corpus fitting;
  *   4. `max(hits) / windows < 0.04` → `unknown`;
  *   5. else argmax by hit count, ties to the alphabetically first
  *      language.
  *
  * Scale: a one-pass per-row scalar inside whole-stage codegen (static
  * [[LangId.compute]] kernel, [[TrigramLang]] below) — zero shuffles,
  * zero lookups outside the 80-entry hash set; the per-language profile
  * sets are JVM-static.
  */
object LangId {

  val Threshold = 0.04

  /** Alphabetical — the order IS the tie-break. */
  val profiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ich", "sch", "ein", "cht",
      "ung", "gen", "nen", "ben", "den", "dem", "mit", "auf", "ist",
      "für", "wir", "eit"),
    "en" -> Seq("the", "and", "ing", "ion", "tio", "tha", "hat", "thi",
      "his", "for", "ith", "wit", "are", "was", "ere", "not", "you",
      "all", "ted", "ave"),
    "es" -> Seq("que", "ión", "ció", "los", "las", "del", "una", "ado",
      "ida", "con", "por", "ara", "sta", "nto", "aba", "mos", "ros",
      "dad", "ene", "ños"),
    "fr" -> Seq("les", "des", "une", "ent", "eur", "aux", "eau", "oir",
      "ais", "ait", "tre", "dan", "ans", "pou", "vou", "ous", "qui",
      "çai", "été", "uis"))

  /** Embedded real-language sample documents (common public phrases —
    * the accuracy yardstick the synthetic fixture buckets cannot provide:
    * every fixture lang bucket draws from one shared English-ish
    * vocabulary, so only these rows make the confusion matrix measure
    * detection, not labeling). Ids start beyond any fixture doc_id. */
  val samples: Seq[(Long, String, String)] = Seq(
    (9000001L, "real:en", "the quick brown fox jumps over the lazy dog and runs into the bright morning for nothing at all"),
    (9000002L, "real:en", "this is the thing that we are all waiting for and there was nothing else in the evening"),
    (9000003L, "real:en", "you have the right to remain silent and anything you say can be used against you"),
    (9000011L, "real:de", "der schnelle braune fuchs springt über den faulen hund und rennt durch die alte stadt"),
    (9000012L, "real:de", "ich denke also bin ich und das ist der anfang der ganzen deutschen philosophie"),
    (9000013L, "real:de", "wir sind mit dem zug nach berlin gefahren und haben die stadt besichtigt"),
    (9000021L, "real:fr", "les enfants jouent dans le jardin pendant que les parents regardent les bateaux"),
    (9000022L, "real:fr", "c'est une belle journée pour aller voir la mer et les oiseaux dans le ciel"),
    (9000023L, "real:fr", "nous pouvons voir les montagnes depuis la fenêtre de la vieille maison"),
    (9000031L, "real:es", "los niños juegan en el jardín mientras los padres miran la televisión por la noche"),
    (9000032L, "real:es", "esta es una canción que habla del corazón y de la vida de los españoles"),
    (9000033L, "real:es", "la ciudad estaba llena de gente que celebraba la fiesta con mucha alegría"),
    (9000041L, "real:zh", "这是一个简单的中文句子用来测试语言识别功能"),
    (9000042L, "real:zh", "今天天气很好我们一起去公园散步吧"))

  private val langs: Array[String] = profiles.map(_._1).toArray
  private val sets: Array[java.util.HashSet[String]] = profiles.map { case (_, ts) =>
    val s = new java.util.HashSet[String](ts.size * 2)
    ts.foreach(s.add)
    s
  }.toArray

  private val ZH = UTF8String.fromString("zh")
  private val UNKNOWN = UTF8String.fromString("unknown")
  private val LANG_U8 = langs.map(UTF8String.fromString)

  /** The classifier kernel (see the contract above). */
  def compute(text: UTF8String): UTF8String = {
    val s = text.toLowerCase.toString
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 0x4E00 && c <= 0x9FFF) return ZH
      i += 1
    }
    val windows = n - 2
    if (windows <= 0) return UNKNOWN
    val hits = new Array[Int](langs.length)
    i = 0
    while (i < windows) {
      val tri = s.substring(i, i + 3)
      var l = 0
      while (l < langs.length) {
        if (sets(l).contains(tri)) hits(l) += 1
        l += 1
      }
      i += 1
    }
    var best = 0
    var l = 1
    while (l < langs.length) {
      if (hits(l) > hits(best)) best = l // strict: ties keep the earlier lang
      l += 1
    }
    if (hits(best).toDouble / windows < Threshold) UNKNOWN
    else LANG_U8(best)
  }
}

/** trigram_lang(text string) → string: see [[LangId]]. */
case class TrigramLang(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "trigram_lang"

  override def nullSafeEval(t: Any): Any =
    LangId.compute(t.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.LangId.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
