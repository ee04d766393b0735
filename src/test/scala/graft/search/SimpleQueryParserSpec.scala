package graft.search

import graft.analysis.Analyzer
import org.scalatest.funsuite.AnyFunSuite

/** Simple syntax → Query ADT. Expectations ported from the reference's
  * own suite (reference:
  * /root/reference/src/Lucene.Net.Tests.QueryParser/Simple/TestSimpleQueryParser.cs
  * — those tests run with a whitespace+lowercase analyzer and default
  * operator MUST; we mirror both with the sqlParity analyzer). */
class SimpleQueryParserSpec extends AnyFunSuite {
  import SimpleQueryParser._

  // ≙ the reference helper Parse(text): default operator MUST
  private def parse(text: String): Option[Query] =
    new SimpleQueryParser(Analyzer.sqlParity, defaultOperator = Must).parse(text)

  private def neg(q: Query): Query =
    BoolQ(should = Seq(MatchAllQ()), mustNot = Seq(q))

  test("term / fuzzy / prefix / phrase / slop (TestTerm..TestPrefix)") {
    assert(parse("foobar") === Some(TermQ("foobar")))
    assert(parse("foobar~2") === Some(FuzzyQ("foobar", 2)))
    assert(parse("foobar~") === Some(TermQ("foobar")), "bare ~ parses as fuzziness 0 → plain term")
    assert(parse("foobar~8") === Some(FuzzyQ("foobar", 2)), "edits capped at 2")
    assert(parse("foobar*") === Some(PrefixQ("foobar")))
    assert(parse("\"foo bar\"") === Some(PhraseQ(Seq("foo", "bar"))))
    assert(parse("\"foo bar\"~2") === Some(PhraseQ(Seq("foo", "bar"), 2)))
    assert(parse("\"foo bar\"~10") === Some(PhraseQ(Seq("foo", "bar"), 10)))
  }

  test("AND, OR, implicit default operator (TestAND/TestOR/TestANDImplicit)") {
    assert(parse("foo+bar") === Some(BoolQ(must = Seq(TermQ("foo"), TermQ("bar")))))
    assert(parse("foo bar") === Some(BoolQ(must = Seq(TermQ("foo"), TermQ("bar")))))
    assert(parse("foo|bar") === Some(BoolQ(should = Seq(TermQ("foo"), TermQ("bar")))))
    assert(parse("foo||bar") === Some(BoolQ(should = Seq(TermQ("foo"), TermQ("bar")))))
    val orDefault = new SimpleQueryParser(Analyzer.sqlParity, defaultOperator = Should)
    assert(orDefault.parse("foo bar") ===
      Some(BoolQ(should = Seq(TermQ("foo"), TermQ("bar")))))
  }

  test("NOT wraps with MatchAll (TestNOT)") {
    assert(parse("-foo") === Some(neg(TermQ("foo"))))
    assert(parse("-(foo)") === Some(neg(TermQ("foo"))))
    assert(parse("---foo") === Some(neg(TermQ("foo"))))
    assert(parse("--foo") === Some(TermQ("foo")), "double negation cancels")
  }

  test("garbage tolerance (TestGarbage*)") {
    val star = Some(TermQ("star"))
    assert(parse("star") === star)
    assert(parse("star\n") === star)
    assert(parse("star(") === star)
    assert(parse("star)") === star)
    assert(parse("star\"") === star)
    assert(parse("\t \r\n\nstar   \n \r \t ") === star)
    assert(parse("- + \"\" - star \\") === star)
    assert(parse("") === None)
    assert(parse("()") === None)
    assert(parse("+ - | \\") === None)
    assert(parse("\"\"") === None)
    val sw = Some(BoolQ(must = Seq(TermQ("star"), TermQ("wars"))))
    assert(parse("     star     wars   ") === sw)
    assert(parse("  |     star + + |   wars   ") === sw)
    assert(parse("star wars empire") ===
      Some(BoolQ(must = Seq(TermQ("star"), TermQ("wars"), TermQ("empire")))),
      "same-operator clauses stay flat")
  }

  test("garbage subquery and unbalanced parens (TestGarbageSubquery)") {
    val star = Some(TermQ("star"))
    assert(parse("(star)") === star)
    assert(parse("(star))") === star)
    assert(parse("((star)") === star)
    assert(parse("     -()(star)        \n\n\r     ") === star)
    assert(parse("| + - ( + - |      star    \n      ) \n") === star)
  }

  test("operator change wraps the accumulated tree (TestComplex00/01/03)") {
    // star|wars empire  →  MUST( SHOULD(star, wars), empire )
    assert(parse("star|wars empire") ===
      Some(BoolQ(must = Seq(BoolQ(should = Seq(TermQ("star"), TermQ("wars"))),
        TermQ("empire")))))
    // star wars | empire  →  SHOULD( MUST(star, wars), empire )
    assert(parse("star wars | empire") ===
      Some(BoolQ(should = Seq(BoolQ(must = Seq(TermQ("star"), TermQ("wars"))),
        TermQ("empire")))))
    // star wars | empire | strikes back
    //   →  MUST( SHOULD( MUST(star,wars), empire, strikes ), back )
    assert(parse("star wars | empire | strikes back") ===
      Some(BoolQ(must = Seq(
        BoolQ(should = Seq(BoolQ(must = Seq(TermQ("star"), TermQ("wars"))),
          TermQ("empire"), TermQ("strikes"))),
        TermQ("back")))))
  }

  test("precedence groups (TestComplex04/05)") {
    // (star wars) | empire | (strikes back)
    assert(parse("(star wars) | empire | (strikes back)") ===
      Some(BoolQ(should = Seq(
        BoolQ(must = Seq(TermQ("star"), TermQ("wars"))),
        TermQ("empire"),
        BoolQ(must = Seq(TermQ("strikes"), TermQ("back")))))))
    // (star wars) | (empire | (strikes back -jarjar))
    assert(parse("(star wars) | (empire | (strikes back -jarjar))") ===
      Some(BoolQ(should = Seq(
        BoolQ(must = Seq(TermQ("star"), TermQ("wars"))),
        BoolQ(should = Seq(TermQ("empire"),
          BoolQ(must = Seq(TermQ("strikes"), TermQ("back"), neg(TermQ("jarjar"))))))))))
  }

  test("escapes (TestCrazyPrefixes / TestTermInDisguise / TestEscaping)") {
    assert(parse("st*ar*") === Some(PrefixQ("st*ar")),
      "inner * is literal, trailing * is the prefix operator")
    assert(parse("st\\*ar") === Some(BoolQ(must = Seq(TermQ("st"), TermQ("ar")))),
      "escaped * reaches the analyzer as a literal; the word tokenizer then splits on it")
    assert(parse("\\\"star\\\"") === Some(TermQ("star")),
      "escaped quotes become part of the token, analyzer strips them")
  }

  test("phrase slop garbage and trailing content (TestPhrase…)") {
    // "foo bar"~12 baz → MUST(phrase~12, baz)
    assert(parse("\"foo bar\"~12 baz") ===
      Some(BoolQ(must = Seq(PhraseQ(Seq("foo", "bar"), 12), TermQ("baz")))))
    // single-token phrase degrades to a term
    assert(parse("\"star\"") === Some(TermQ("star")))
  }

  test("flags disable operators (TestDisable…)") {
    val noPrefix = new SimpleQueryParser(Analyzer.sqlParity, Must,
      AllFlags & ~Prefix)
    assert(noPrefix.parse("foobar*") === Some(TermQ("foobar")),
      "with PREFIX disabled, trailing * is ordinary text the analyzer drops")
    val noNot = new SimpleQueryParser(Analyzer.sqlParity, Must, AllFlags & ~Not)
    assert(noNot.parse("-foo") === Some(TermQ("foo")))
    val noPhrase = new SimpleQueryParser(Analyzer.sqlParity, Must, AllFlags & ~Phrase)
    assert(noPhrase.parse("\"foo bar\"") ===
      Some(BoolQ(must = Seq(TermQ("foo"), TermQ("bar")))),
      "with PHRASE disabled, quotes are ordinary characters")
  }
}
