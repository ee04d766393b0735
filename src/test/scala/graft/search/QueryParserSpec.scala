package graft.search

import graft.analysis.Analyzer
import org.scalatest.funsuite.AnyFunSuite

/** Classic syntax → Query ADT (reference syntax:
  * /root/reference/src/Lucene.Net.QueryParser/Classic/QueryParser.cs). */
class QueryParserSpec extends AnyFunSuite {
  private val p = new QueryParser(Analyzer.standard)

  test("single term analyzes (lowercase)") {
    assert(p.parse("Hello") === TermQ("hello"))
  }

  test("default OR: bare terms are SHOULD clauses") {
    assert(p.parse("foo bar") === BoolQ(should = Seq(TermQ("foo"), TermQ("bar"))))
  }

  test("AND upgrades both neighbors to MUST") {
    assert(p.parse("foo AND bar") === BoolQ(must = Seq(TermQ("foo"), TermQ("bar"))))
    assert(p.parse("a1 OR b1") === BoolQ(should = Seq(TermQ("a1"), TermQ("b1"))))
  }

  test("+ - and NOT modifiers") {
    assert(p.parse("+foo -bar baz") ===
      BoolQ(must = Seq(TermQ("foo")), should = Seq(TermQ("baz")),
        mustNot = Seq(TermQ("bar"))))
    assert(p.parse("foo NOT bar") ===
      BoolQ(should = Seq(TermQ("foo")), mustNot = Seq(TermQ("bar"))))
    assert(p.parse("foo !bar") ===
      BoolQ(should = Seq(TermQ("foo")), mustNot = Seq(TermQ("bar"))),
      "'!' must lex as a prohibition operator")
  }

  test("quoted phrase with slop; stopwords analyzed out of phrase text") {
    assert(p.parse("\"state machine\"") === PhraseQ(Seq("state", "machine"), raw = Some("state machine")))
    assert(p.parse("\"state machine\"~2") === PhraseQ(Seq("state", "machine"), 2, raw = Some("state machine")))
    // "of" is a stopword: analyzed phrase keeps remaining tokens
    assert(p.parse("\"state of machine\"") === PhraseQ(Seq("state", "machine"), raw = Some("state of machine")))
  }

  test("stopword-only clause vanishes") {
    assert(p.parse("the foo") === TermQ("foo"))
  }

  test("wildcard, prefix, regexp, fuzzy, range") {
    assert(p.parse("pre*") === PrefixQ("pre"))
    assert(p.parse("wi?ld*") === WildcardQ("wi?ld*"))
    assert(p.parse("/ab+c/") === RegexpQ("ab+c"))
    assert(p.parse("merge~") === FuzzyQ("merge", 2))
    assert(p.parse("merge~1") === FuzzyQ("merge", 1))
    assert(p.parse("[aa TO bb]") === TermRangeQ("aa", "bb", true, true))
    assert(p.parse("{aa TO bb}") === TermRangeQ("aa", "bb", false, false))
    assert(p.parse("[aa TO *]") === TermRangeQ("aa", null, true, true))
  }

  test("boosts on terms and groups") {
    assert(p.parse("foo^2") === TermQ("foo", 2f))
    assert(p.parse("(foo bar)^3") ===
      BoolQ(should = Seq(TermQ("foo"), TermQ("bar")), boost = 3f))
  }

  test("field prefix accepted and ignored (single-field engine)") {
    assert(p.parse("content:foo") === TermQ("foo"))
    assert(p.parse("content:merge~1") === FuzzyQ("merge", 1))
  }

  test("grouping nests") {
    assert(p.parse("foo AND (bar OR baz)") ===
      BoolQ(must = Seq(TermQ("foo"),
        BoolQ(should = Seq(TermQ("bar"), TermQ("baz"))))))
  }

  test("dangling input / unbalanced parens rejected") {
    intercept[IllegalArgumentException](p.parse("(foo"))
  }

  test("complex phrase: wildcard/prefix/fuzzy parts inside quotes") {
    val p = new QueryParser()
    assert(p.parse("\"merg* table\"") ===
      ComplexPhraseQ(Seq(PrefixQ("merg"), TermQ("table"))))
    assert(p.parse("\"wi?ld merge~1 exact\"~2") ===
      ComplexPhraseQ(Seq(WildcardQ("wi?ld"), FuzzyQ("merge", 1), TermQ("exact")), 2))
    // stopword parts vanish like in plain phrases
    assert(p.parse("\"a merg*\"") === ComplexPhraseQ(Seq(PrefixQ("merg"))))
  }

  test("ExtendableQueryParser hook: key:raw and field:key:raw resolve " +
       "registered extensions; unregistered keys fall back to classic " +
       "(Ext/ExtendableQueryParser.cs resolve-or-super)") {
    val exts = Map[String, ExtensionQuery => Query](
      "pfx" -> (eq => PrefixQ(eq.rawQueryString)))
    val p = new QueryParser(extensions = exts)
    // key alone: default field flows into the ExtensionQuery
    assert(p.parse("pfx:mer") === PrefixQ("mer"))
    // explicit field part (single-text-field engine: field recorded,
    // query built by the extension)
    assert(p.parse("content:pfx:mer") === PrefixQ("mer"))
    // composes with the grammar: boost + boolean context
    assert(p.parse("pfx:mer^2 -vector") === BoolQ(
      should = Seq(PrefixQ("mer", boost = 2f)),
      mustNot = Seq(TermQ("vector"))))
    // unregistered key: classic behavior (field ignored, term parsed)
    assert(p.parse("nope:mer") === TermQ("mer"))
    // field captured verbatim for the extension to use
    val seen = scala.collection.mutable.ArrayBuffer.empty[ExtensionQuery]
    val spy = Map[String, ExtensionQuery => Query](
      "k" -> (eq => { seen += eq; TermQ(eq.rawQueryString) }))
    new QueryParser(extensions = spy).parse("title:k:abc")
    assert(seen.toSeq === Seq(ExtensionQuery("title", "abc")))
    new QueryParser(extensions = spy).parse("k:abc")
    assert(seen.last === ExtensionQuery("content", "abc"))
  }

  test("AnalyzingQueryParser mode: multi-term chunks pass through the " +
       "analyzer; one-token-per-chunk enforced (Analyzing/AnalyzingQueryParser.cs)") {
    import graft.analysis.Analyzer
    val p = new QueryParser(analyzer = Analyzer.englishStemming,
      analyzeMultiTerm = true)
    // prefix/fuzzy: whole term analyzed (Porter stems runnings -> run)
    assert(p.parse("runnings*") === PrefixQ("run"))
    assert(p.parse("runnings~1") === FuzzyQ("run", 1))
    // wildcard: each non-wildcard chunk analyzed, wildcards kept
    assert(p.parse("runnings*walked") === WildcardQ("run*walk"))
    assert(p.parse("Mergers?") === WildcardQ("merger?"))
    // classic mode only lowercases
    assert(new QueryParser(analyzer = Analyzer.englishStemming)
      .parse("runnings*") === PrefixQ("runnings"))
    // zero tokens (stopword chunk) and several tokens are parse errors
    intercept[IllegalArgumentException](p.parse("the*"))
    // ',' joins digits but not letters under UAX#29, so the chunk
    // analyzes to two tokens
    intercept[IllegalArgumentException](p.parse("x,y*"))
  }

  test("classic float fuzzy suffix maps to edits; malformed suffix rejected") {
    val p = new QueryParser()
    assert(p.parse("roam~0.8") === FuzzyQ("roam", 1))
    assert(p.parse("roam~0.3") === FuzzyQ("roam", 2))
    // the lexer attaches only digit/dot suffixes — '~abc' lexes as a
    // default fuzzy plus a separate term, never a NumberFormatException
    assert(p.parse("roam~abc") ===
      BoolQ(should = Seq(FuzzyQ("roam", 2), TermQ("abc"))))
  }
}
