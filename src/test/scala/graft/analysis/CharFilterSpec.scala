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

  // ---- HTMLStripCharFilter ----

  test("htmlStrip: inline tags vanish, block tags separate, offsets point at the markup") {
    val f = CharFilters.htmlStrip()
    val html = """<div class="x">find <b>jobs</b> here</div>"""
    val r = f(html)
    assert(r.text === "\nfind jobs here\n")
    val tok = CharFilters.wrapTokenizer(f, UAX29Tokenizer.tokenize)
    val ts = toks(tok, html)
    // end offsets ABSORB a directly-trailing stripped tag — the reference
    // contract (HTMLStripCharFilter.cs positions each correction at
    // output+substitution length with the NEW diff, and BaseCharFilter
    // applies entries at offset <= off), so "jobs" ends after "</b>"
    assert(ts === Seq(("find", 15, 19), ("jobs", 23, 31), ("here", 32, 36)))
    // the corrected span always BEGINS with the token text in the markup
    ts.foreach { case (term, s, e) => assert(html.substring(s, e).startsWith(term)) }
  }

  test("htmlStrip: entities decode with exact offsets; bare & and literal < survive") {
    val f = CharFilters.htmlStrip()
    val html = "a &amp; b &#65; &#x42; c & d < e &unknown; f"
    val r = f(html)
    assert(r.text === "a & b A B c & d < e &unknown; f")
    // token offsets over the entity-decoded text map back onto the entity
    val tok = CharFilters.wrapTokenizer(f, UAX29Tokenizer.tokenize)
    val byTerm = toks(tok, html).map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byTerm("A") === ((10, 15)), "span covers the whole &#65; entity")
    assert(html.substring(10, 15) === "&#65;")
    assert(byTerm("B") === ((16, 22)))
  }

  test("htmlStrip: script and style vanish with their content") {
    val f = CharFilters.htmlStrip()
    val html = "pre<script type=\"a\">var x = '<div>';</script>post<style>a{}</style>end"
    assert(f(html).text === "pre\npost\nend")
    val ts = toks(CharFilters.wrapTokenizer(f, UAX29Tokenizer.tokenize), html)
    ts.foreach { case (term, s, e) => assert(html.substring(s, e).startsWith(term)) }
  }

  test("htmlStrip: comments, doctype, PI, CDATA markers removed; CDATA content kept") {
    val f = CharFilters.htmlStrip()
    val html = "<!DOCTYPE html><?xml v?>a <!-- note --> b <![CDATA[keep<this]]> c"
    assert(f(html).text === "a  b keep<this c")
    // 'keep' starts right after the CDATA open marker in the original;
    // the '<' inside the section is NOT parsed as markup
    val tok = CharFilters.wrapTokenizer(f, UAX29Tokenizer.tokenize)
    val byTerm = toks(tok, html).map(t => t._1 -> ((t._2, t._3))).toMap
    assert(html.substring(byTerm("keep")._1).startsWith("keep"))
    assert(byTerm.contains("this"), "CDATA content '<this' keeps its text")
  }

  test("htmlStrip: quoted '>' inside attributes does not close the tag") {
    val f = CharFilters.htmlStrip()
    assert(f("""x<a href="a>b" title='c>d'>y</a>z""").text === "xyz")
  }

  test("htmlStrip: escaped tags pass through verbatim") {
    val f = CharFilters.htmlStrip(escapedTags = Set("b"))
    val html = "<div>x <b>y</b></div>"
    assert(f(html).text === "\nx <b>y</b>\n")
  }

  test("htmlStrip: unterminated markup degrades to literal text") {
    val f = CharFilters.htmlStrip()
    assert(f("a < b and 1<2").text === "a < b and 1<2")
    assert(f("trailing <div unclosed").text === "trailing <div unclosed")
  }
}
