package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Char filters + pattern tokenizer + stemmer protection — hand-computed
  * vectors against the reference semantics (MappingCharFilter.cs,
  * PatternReplaceCharFilter.cs, PatternTokenizer.cs,
  * SetKeywordMarkerFilter.cs, StemmerOverrideFilter.cs). */
class CharFilterSpec extends AnyFunSuite {

  private def toks(f: String => Array[RawToken], s: String) =
    f(s).map(t => (t.term, t.startOff, t.endOff)).toSeq

  // ---- MappingCharFilter ----

  test("mapping: shrink corrects the token end back to the original") {
    val f = CharFilters.mapping(Map("aa" -> "a"))
    val r = f("aab")
    assert(r.text === "ab")
    assert(r.correct(0) === 0 && r.correct(1) === 2 && r.correct(2) === 3)
  }

  test("mapping: growth steps the diff down per extra char") {
    val r = CharFilters.mapping(Map("k" -> "kkk"))("ak")
    assert(r.text === "akkk")
    assert(r.correct(1) === 1)  // the k itself
    assert(r.correct(4) === 2)  // token end past the growth → original end
  }

  test("mapping: greedy longest match wins; replacements never re-scanned") {
    assert(CharFilters.mapping(Map("a" -> "x", "ab" -> "y"))("ab").text === "y")
    assert(CharFilters.mapping(Map("a" -> "b", "b" -> "c"))("ab").text === "bc")
  }

  test("mapping: cumulative diffs across multiple matches") {
    val r = CharFilters.mapping(Map("aa" -> "a"))("aabaa")
    assert(r.text === "aba")
    assert(r.correct(3) === 5) // end of output == end of original
    assert(r.correct(2) === 3) // start of the second collapsed pair
  }

  test("wrapTokenizer: offsets land on the original text") {
    val tok = CharFilters.wrapTokenizer(
      CharFilters.mapping(Map("ß" -> "ss")), UAX29Tokenizer.tokenize)
    assert(toks(tok, "straße x") ===
      Seq(("strasse", 0, 6), ("x", 7, 8)))
  }

  // ---- PatternReplaceCharFilter ----

  test("patternReplace: shrink + growth corrections") {
    val shrink = CharFilters.patternReplace("aa", "a")("aab")
    assert(shrink.text === "ab" && shrink.correct(2) === 3)
    val grow = CharFilters.patternReplace("a", "aa")("ba")
    assert(grow.text === "baa" && grow.correct(3) === 2)
  }

  test("patternReplace: group references") {
    val r = CharFilters.patternReplace("(a+)\\s+(b+)", "$2 $1")("aa bbb x")
    assert(r.text === "bbb aa x")
  }

  test("patternReplace: multiple matches accumulate") {
    val r = CharFilters.patternReplace("o+", "o")("foo boo")
    assert(r.text === "fo bo")
    assert(r.correct(2) === 3 && r.correct(5) === 7)
  }

  // ---- PatternTokenizer ----

  test("patternTokenizer: group mode (reference example)") {
    val in = "aaa 'bbb' 'ccc'"
    assert(toks(Tokenizers.patternTokenizer("'([^']+)'", 1), in) ===
      Seq(("bbb", 5, 8), ("ccc", 11, 14)))
    assert(toks(Tokenizers.patternTokenizer("'([^']+)'", 0), in) ===
      Seq(("'bbb'", 4, 9), ("'ccc'", 10, 15)))
  }

  test("patternTokenizer: split mode drops empties") {
    assert(toks(Tokenizers.patternTokenizer("[\\s,]+"), "aaa, bbb ccc") ===
      Seq(("aaa", 0, 3), ("bbb", 5, 8), ("ccc", 9, 12)))
    assert(toks(Tokenizers.patternTokenizer(","), ",a,,b,") ===
      Seq(("a", 1, 2), ("b", 4, 5)))
  }

  test("patternTokenizer: invalid group rejected") {
    intercept[IllegalArgumentException] {
      Tokenizers.patternTokenizer("(a)", 2)
    }
  }

  // ---- stemmer protection ----

  test("keywordMarker: set and pattern protection") {
    val stem = TokenFilters.keywordMarker(PorterStemmer.stem _,
      keywords = Set("running"), pattern = Some(".*ides"))
    assert(stem("running") === "running")
    assert(stem("tides") === "tides")
    assert(stem("jumping") === PorterStemmer.stem("jumping"))
  }

  test("stemmerOverride: dictionary short-circuits the stemmer") {
    val stem = TokenFilters.stemmerOverride(Map("mice" -> "mouse"),
      PorterStemmer.stem _)
    assert(stem("mice") === "mouse")
    assert(stem("running") === PorterStemmer.stem("running"))
    val ic = TokenFilters.stemmerOverride(Map("Mice" -> "mouse"),
      PorterStemmer.stem _, ignoreCase = true)
    assert(ic("mICE") === "mouse")
  }
}
