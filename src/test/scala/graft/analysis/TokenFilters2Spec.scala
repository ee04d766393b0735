package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Vectors for the classic tokenizer and filter-pack 2 — drawn from the
  * reference's own tests (TestClassicAnalyzer.cs, CommonGramsFilterTest.cs
  * :99-131 query section, TestPatternCaptureGroupTokenFilter.cs,
  * TestCJKWidthFilter.cs). */
class TokenFilters2Spec extends AnyFunSuite {

  private def terms(text: String): Seq[String] =
    ClassicTokenizer.analyzer.analyze(text).tokens.map(_.term).toSeq

  private def rawTypes(text: String): Seq[(String, String)] =
    ClassicTokenizer.tokenize(text).map(t => (t.term, t.tpe)).toSeq

  test("classic analyzer — reference vectors") {
    assert(terms("B2B") == Seq("b2b"))
    assert(terms("2B") == Seq("2b"))
    assert(terms("word_having_underscore") == Seq("word", "having", "underscore"))
    assert(terms("word_with_underscore_and_stopwords") == Seq("word", "underscore", "stopwords"))
    assert(terms("some-dashed-phrase") == Seq("some", "dashed", "phrase"))
    assert(terms("dogs,chase,cats") == Seq("dogs", "chase", "cats"))
    assert(terms("ac/dc") == Seq("ac", "dc"))
    assert(terms("O'Reilly") == Seq("o'reilly"))
    assert(terms("you're") == Seq("you're"))
    assert(terms("she's") == Seq("she"))
    assert(terms("Jim's") == Seq("jim"))
    assert(terms("don't") == Seq("don't"))
    assert(terms("O'Reilly's") == Seq("o'reilly"))
    assert(terms("AT&T") == Seq("at&t"))
    assert(terms("Excite@Home") == Seq("excite@home"))
    assert(terms("test@example.com") == Seq("test@example.com"))
    assert(terms("first.lastname@example.com") == Seq("first.lastname@example.com"))
    assert(terms("first_lastname@example.com") == Seq("first_lastname@example.com"))
    assert(terms("21.35") == Seq("21.35"))
    assert(terms("R2D2 C3PO") == Seq("r2d2", "c3po"))
    assert(terms("216.239.63.104") == Seq("216.239.63.104"))
    assert(terms("1-2-3") == Seq("1-2-3"))
    assert(terms("a1-b2-c3") == Seq("a1-b2-c3"))
    assert(terms("a1-b-c3") == Seq("a1-b-c3"))
    assert(terms("David has 5000 bones") == Seq("david", "has", "5000", "bones"))
    assert(terms("C++") == Seq("c"))
    assert(terms("C#") == Seq("c"))
    assert(terms("U.S.A.") == Seq("usa"))
    assert(terms("\"QUOTED\" word") == Seq("quoted", "word"))
    assert(terms("안녕하세요 한글입니다") == Seq("안녕하세요", "한글입니다"))
  }

  test("classic token types — HOST beats NUM on ties; ACRONYM_DEP → HOST") {
    assert(rawTypes("62.46") == Seq("62.46" -> "<HOST>"))
    assert(rawTypes("2004.jpg") == Seq("2004.jpg" -> "<HOST>"))
    assert(rawTypes("978-0-94045043-1") == Seq("978-0-94045043-1" -> "<NUM>"))
    assert(rawTypes("78academyawards/rules/rule02.html") ==
      Seq("78academyawards/rules/rule02.html" -> "<NUM>"))
    // trailing-dot host: the deprecated acronym production, re-typed
    assert(rawTypes("www.nutch.org.") == Seq("www.nutch.org" -> "<HOST>"))
    assert(rawTypes("U.S.A.").head._2 == "<ACRONYM>")
    assert(rawTypes("AT&T") == Seq("AT&T" -> "<COMPANY>"))
    // CJ chars one token each
    assert(rawTypes("仮名").map(_._1) == Seq("仮", "名"))
    assert(rawTypes("仮名").forall(_._2 == "<CJ>"))
  }

  private def tok(ts: String*): Array[Token] =
    ts.zipWithIndex.map { case (t, i) => Token(t, i, i * 10, i * 10 + t.length) }.toArray

  test("english possessive + apostrophe filters") {
    assert(TokenFilters2.englishPossessive(tok("jim's", "don't", "bill’s", "x"))
      .map(_.term).toSeq == Seq("jim", "don't", "bill", "x"))
    assert(TokenFilters2.apostrophe(tok("istanbul'da", "ankara’dan", "izmir"))
      .map(_.term).toSeq == Seq("istanbul", "ankara", "izmir"))
  }

  test("upperCase, codepointCount, limitTokenPosition") {
    assert(TokenFilters2.upperCase(tok("aéz")).head.term == "AÉZ")
    // 𝒳 is one codepoint, two chars
    assert(TokenFilters2.codepointCount(tok("ab", "𝒳", "abcd"), 2, 2)
      .map(_.term).toSeq == Seq("ab"))
    assert(TokenFilters2.codepointCount(tok("ab", "𝒳", "abcd"), 1, 2)
      .map(_.term).toSeq == Seq("ab", "𝒳"))
    assert(TokenFilters2.limitTokenPosition(tok("a", "b", "c"), 2)
      .map(_.term).toSeq == Seq("a", "b"))
  }

  test("cjk width — reference vectors") {
    def w(s: String) = TokenFilters2.cjkWidthTerm(s)
    assert(w("Ｔｅｓｔ") == "Test")
    assert(w("１２３４") == "1234")
    assert(w("ｶﾀｶﾅ") == "カタカナ")
    assert(w("ｳﾞｨｯﾂ") == "ヴィッツ")
    assert(w("ﾊﾟﾅｿﾆｯｸ") == "パナソニック")
    assert(w("already") == "already")
  }

  test("pattern replace + capture groups — reference vectors") {
    assert(TokenFilters2.patternReplace(tok("aabbcc"), "b+", "-")
      .head.term == "aa-cc")
    def caps(term: String, pats: Seq[String], preserve: Boolean) =
      TokenFilters2.patternCaptureGroups(tok(term), pats, preserve)
        .map(t => (t.term, t.position)).toSeq
    // no groups / no match → original unchanged
    assert(caps("foobarbaz", Seq("xx"), false) == Seq("foobarbaz" -> 0))
    assert(caps("foobarbaz", Seq(".."), false) == Seq("foobarbaz" -> 0))
    // whole-token group, !preserve: capture replaces with identical text
    assert(caps("foobarbaz", Seq("(.+)"), false) == Seq("foobarbaz" -> 0))
    // ^(.) !preserve → "f" replaces; preserve → original + capture
    assert(caps("foobarbaz", Seq("^(.)"), false) == Seq("f" -> 0))
    assert(caps("foobarbaz", Seq("^(.)"), true) ==
      Seq("foobarbaz" -> 0, "f" -> 0))
    assert(caps("foobarbaz", Seq("^(.)(.)"), false) ==
      Seq("f" -> 0, "o" -> 0))
    assert(caps("foobarbaz", Seq("^(.).+(.)$"), true) ==
      Seq("foobarbaz" -> 0, "f" -> 0, "z" -> 0))
    // captures keep the ORIGINAL token offsets
    val c = TokenFilters2.patternCaptureGroups(tok("foobarbaz"), Seq("^(.)"), true)
    assert(c.forall(t => t.startOff == 0 && t.endOff == 9))
  }

  test("common grams query filter — reference state machine vectors") {
    def q(text: String) = TokenFilters2.commonGramsQuery(
      tok(text.split(" ").toSeq: _*), Set("the", "of")).map(_.term).toSeq
    assert(q("brown fox") == Seq("brown", "fox"))
    assert(q("the fox") == Seq("the_fox"))
    assert(q("fox of") == Seq("fox_of"))
    assert(q("of the") == Seq("of_the"))
    assert(q("the") == Seq("the"))
    assert(q("foo") == Seq("foo"))
    assert(q("quick brown fox") == Seq("quick", "brown", "fox"))
    assert(q("quick brown the") == Seq("quick", "brown_the"))
    assert(q("quick the brown") == Seq("quick_the", "the_brown"))
    assert(q("the quick brown") == Seq("the_quick", "quick", "brown"))
    assert(q("quick the fox") == Seq("quick_the", "the_fox"))
    assert(q("fox of the") == Seq("fox_of", "of_the"))
    assert(q("the fox of") == Seq("the_fox", "fox_of"))
    assert(q("of the fox") == Seq("of_the", "the_fox"))
    assert(q("of the of") == Seq("of_the", "the_of"))
    // output positions re-spaced to consecutive
    val out = TokenFilters2.commonGramsQuery(tok("the", "fox", "of"), Set("the", "of"))
    assert(out.map(_.position).toSeq == out.indices.toSeq)
  }

  test("payload setters + tee/sink") {
    val withNum = TokenFilters2.numericPayload(tok("a", "b"), 2.5f, _.term == "a")
    assert(java.nio.ByteBuffer.wrap(withNum(0).payload).getFloat == 2.5f)
    assert(withNum(1).payload == null)
    val offs = TokenFilters2.tokenOffsetPayload(tok("abc"))
    val bb = java.nio.ByteBuffer.wrap(offs(0).payload)
    assert(bb.getInt == 0 && bb.getInt == 3)
    val typed = TokenFilters2.typeAsPayload(ClassicTokenizer.tokenize("AT&T 12"))
    assert(new String(typed(0).payload, "UTF-8") == "<COMPANY>")

    val (primary, sinks) = TokenFilters2.teeSink(tok("2024-01-15", "word"),
      Seq(TokenFilters2.dateSink()))
    assert(primary.length == 2)
    assert(sinks.head.map(_.term).toSeq == Seq("2024-01-15"))
    assert(TokenFilters2.rangeSink(tok("a", "b", "c", "d"), 1, 3)
      .map(_.term).toSeq == Seq("b", "c"))
    assert(TokenFilters2.typeSink(ClassicTokenizer.tokenize("foo 1-2"), "<NUM>")
      .map(_.term).toSeq == Seq("1-2"))
  }


  test("prefix-aware concatenation shifts suffix positions and offsets") {
    val pre = Array(Token("^", 0, 0, 1))
    val in = tok("a", "b") // positions 0,1; offsets (0,1),(10,11)
    val out = TokenFilters2.prefixAware(pre, in)
    assert(out.map(_.term).toSeq == Seq("^", "a", "b"))
    assert(out.map(_.position).toSeq == Seq(0, 1, 2))
    assert(out(1).startOff == 1 && out(2).startOff == 11)
    val both = TokenFilters2.prefixAndSuffixAware(pre, in, Array(Token("$", 0, 0, 1)))
    assert(both.map(_.term).toSeq == Seq("^", "a", "b", "$"))
    assert(both.last.position == 3)
    // empty prefix is the identity
    assert(TokenFilters2.prefixAware(Array.empty, in).toSeq == in.toSeq)
  }
}
