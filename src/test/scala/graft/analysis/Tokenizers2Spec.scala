package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Char-tokenizer family + n-gram tokenizers (reference vectors from
  * NGramTokenizerTest.cs:73-103 / EdgeNGramTokenizerTest.cs:89-130) and
  * the PerFieldAnalyzer wrapper. */
class Tokenizers2Spec extends AnyFunSuite {

  private def tt(ts: Array[RawToken]) = ts.map(t => (t.term, t.startOff, t.endOff)).toSeq

  test("keyword / letter / whitespace tokenizers") {
    assert(tt(Tokenizers.keyword("a b c")) == Seq(("a b c", 0, 5)))
    assert(Tokenizers.keyword("").isEmpty)
    assert(tt(Tokenizers.letterTokenize("ab1cd ef")) ==
      Seq(("ab", 0, 2), ("cd", 3, 5), ("ef", 6, 8)))
    assert(tt(Tokenizers.whitespaceTokenize("ab1 c-d")) ==
      Seq(("ab1", 0, 3), ("c-d", 4, 7)))
  }

  test("ngram tokenizer — reference vectors") {
    assert(Tokenizers.ngramTokenize(1, 1)("abcde").map(_.term).toSeq ==
      Seq("a", "b", "c", "d", "e"))
    assert(Tokenizers.ngramTokenize(2, 2)("abcde").map(_.term).toSeq ==
      Seq("ab", "bc", "cd", "de"))
    assert(Tokenizers.ngramTokenize(1, 3)("abcde").map(_.term).toSeq ==
      Seq("a", "ab", "abc", "b", "bc", "bcd", "c", "cd", "cde", "d", "de", "e"))
    assert(Tokenizers.ngramTokenize(6, 7)("abcde").isEmpty)
    // offsets ride the original string
    val g = Tokenizers.ngramTokenize(2, 2)("abcde")
    assert(g.map(t => (t.startOff, t.endOff)).toSeq ==
      Seq((0, 2), (1, 3), (2, 4), (3, 5)))
    // supplementary codepoints are gram units, not UTF-16 chars
    assert(Tokenizers.ngramTokenize(1, 1)("𝒳b").map(_.term).toSeq == Seq("𝒳", "b"))
  }

  test("edge ngram tokenizer — front and back") {
    assert(tt(Tokenizers.edgeNGramTokenize(1, 3)("abcde")) ==
      Seq(("a", 0, 1), ("ab", 0, 2), ("abc", 0, 3)))
    assert(tt(Tokenizers.edgeNGramTokenize(1, 3, back = true)("abcde")) ==
      Seq(("e", 4, 5), ("de", 3, 5), ("cde", 2, 5)))
    assert(Tokenizers.edgeNGramTokenize(1, 1)("abcde").map(_.term).toSeq == Seq("a"))
  }

  test("per-field analyzer routing") {
    val pf = PerFieldAnalyzer(Analyzer.standard,
      Map("id" -> new Analyzer(Set.empty, 255, Tokenizers.keyword)))
    assert(pf.analyze("body", "The Merge").tokens.map(_.term).toSeq == Seq("merge"))
    assert(pf.analyze("id", "The Merge").tokens.map(_.term).toSeq == Seq("the merge"))
    assert(pf.forField("other") eq Analyzer.standard)
  }
}
