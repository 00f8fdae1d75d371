package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** clean_text: NFC + control strip + whitespace collapse. The q126
  * oracle is DuckDB's independent NFC; this spec pins the contract
  * details the oracle can't isolate. Unicode is spelled with escape
  * sequences so the source stays ASCII and the decomposed/composed
  * distinction survives editors. */
class CleanTextSpec extends AnyFunSuite {

  test("NFC composes decomposed accents") {
    // e + combining acute (U+0301) composes to e-acute (U+00E9)
    assert(CleanText.clean("e\u0301tude") == "\u00e9tude")
    // already-composed text is untouched
    assert(CleanText.clean("\u00e9tude") == "\u00e9tude")
    // NFC, not NFKC: compatibility forms (ligature fi U+FB01) survive
    assert(CleanText.clean("\ufb01n") == "\ufb01n")
  }

  test("C0 controls strip without becoming separators") {
    assert(CleanText.clean("a\u0007b") == "ab")
    assert(CleanText.clean("a \u0001 b") == "a b")
    // VT and FF are in the STRIP class (Java-regex-vs-RE2 divergence)
    assert(CleanText.clean("a\u000bb\u000cc") == "abc")
    assert(CleanText.clean("de\u007flete") == "delete")
  }

  test("whitespace runs collapse to single spaces, trimmed") {
    assert(CleanText.clean("  a \t\t b \r\n c  ") == "a b c")
    assert(CleanText.clean("") == "")
    assert(CleanText.clean(" \t\r\n ") == "")
    // non-ASCII spaces (NBSP U+00A0) are NOT whitespace here — both
    // dialects agree on that, so the contract keeps them verbatim
    assert(CleanText.clean("a\u00a0b") == "a\u00a0b")
  }

  test("supplementary characters pass through unharmed") {
    val s = "a \ud83d\ude00 b" // U+1F600 as a surrogate pair
    assert(CleanText.clean(s) == s)
  }
}
