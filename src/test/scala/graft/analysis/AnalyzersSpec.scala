package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** The named analyzer registry — each composition's distinguishing
  * behavior. */
class AnalyzersSpec extends AnyFunSuite {

  private def terms(a: Analyzer, s: String) = a.analyze(s).tokens.map(_.term).toSeq

  test("simple / whitespace / stop / keyword case+split semantics") {
    assert(terms(Analyzers.simple, "The Quick-Brown 42") ==
      Seq("the", "quick", "brown")) // letters only, lowercased, no stop
    assert(terms(Analyzers.whitespace, "The Quick-Brown 42") ==
      Seq("The", "Quick-Brown", "42")) // case preserved, split on space
    assert(terms(Analyzers.stop, "The Quick the Brown") ==
      Seq("quick", "brown")) // lowercase + English stop
    assert(terms(Analyzers.keyword, "The Quick Brown") ==
      Seq("The Quick Brown")) // one verbatim token
  }

  test("uax29UrlEmail keeps URLs/emails whole") {
    assert(terms(Analyzers.uax29UrlEmail, "mail bob@example.com now") ==
      Seq("mail", "bob@example.com", "now"))
  }

  test("pattern analyzer splits by regex") {
    assert(terms(Analyzers.pattern("\\W+"), "foo,bar THE baz") ==
      Seq("foo", "bar", "baz"))
  }

  test("snowball analyzer accepts reference names and codes") {
    assert(terms(Analyzers.snowball("english"), "running dogs") ==
      Seq("run", "dog"))
    assert(terms(Analyzers.snowball("lovins"), "nationally") ==
      Seq(graft.analysis.SnowballLovins.stem("nationally")))
    assertThrows[IllegalArgumentException](Analyzers.snowball("klingon"))
  }

  test("brazilian analyzer uses the hand-coded stemmer") {
    assert(Analyzers.brazilian.analyze("boatos bobagem").tokens.map(_.term).toSeq ==
      Seq("boat", "bobag"))
  }

  test("limited and shingled wrappers") {
    val d = Analyzers.limited(Analyzer.noStop, 2)("a b c d")
    assert(d.tokens.map(_.term).toSeq == Seq("a", "b"))
    val sh = Analyzers.shingled(Analyzer.noStop)("a b c")
    assert(sh.map(_.term).toSeq == Seq("a", "a b", "b", "b c", "c"))
  }
}
