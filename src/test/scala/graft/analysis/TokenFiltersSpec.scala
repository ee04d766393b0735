package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Token-filter pack (reference: Analysis.Common — Shingle, NGram,
  * EdgeNGram, CommonGrams, Reverse, Truncate, Capitalization, Length,
  * LimitTokenCount, KeywordRepeat+RemoveDuplicates). Vectors derived
  * from the reference classes' documented behavior. */
class TokenFiltersSpec extends AnyFunSuite {

  private def toks(text: String, stop: Set[String] = Set.empty): Array[Token] =
    new Analyzer(stop).analyze(text).tokens

  test("shingle: bigrams with stop-gap fillers, unigrams kept") {
    // reference doc example: stop word leaves a gap -> "divide _", "_ sentence"
    val ts = toks("please divide this sentence", stop = Set("this"))
    val full = TokenFilters.shingle(ts)
    val got = full.map(t => (t.term, t.position)).toSeq
    assert(got == Seq(
      ("please", 0), ("please divide", 0),
      ("divide", 1), ("divide _", 1),
      ("_ sentence", 2),
      ("sentence", 3)))
    // fillers occupy no space — span (nextReal.start, nextReal.start),
    // so offsets match ShingleFilterTest's BI_GRAM_TOKENS_WITH_HOLES:
    // "divide _" = (7,19), "_ sentence" = (19,27)
    val offs = full.map(t => t.term -> (t.startOff, t.endOff)).toMap
    assert(offs("divide _") === (7, 19))
    assert(offs("_ sentence") === (19, 27))
  }

  test("shingle: trigram range, no unigrams") {
    val ts = toks("a b c d")
    val got = TokenFilters.shingle(ts, minN = 2, maxN = 3,
      outputUnigrams = false).map(_.term).toSeq
    assert(got == Seq("a b", "a b c", "b c", "b c d", "c d"))
  }

  test("ngrams and edge ngrams share the source position") {
    val ts = toks("merge")
    val ng = TokenFilters.nGrams(ts, 2, 3).map(_.term).toSeq
    assert(ng == Seq("me", "er", "rg", "ge", "mer", "erg", "rge"))
    assert(TokenFilters.nGrams(ts, 2, 3).forall(_.position == 0))
    val eg = TokenFilters.edgeNGrams(ts, 1, 3).map(_.term).toSeq
    assert(eg == Seq("m", "me", "mer"))
  }

  test("commonGrams: reference example man of the year") {
    val ts = toks("man of the year")
    val grams = TokenFilters.commonGrams(ts, Set("of", "the"))
    val got = grams.map(_.term).toSeq
    assert(got == Seq("man", "man_of", "of", "of_the", "the", "the_year", "year"))
    // the gram rides posIncr 0 after the FIRST word (GramToken,
    // CommonGramsFilter.cs:201): same position as w1, offsets spanning both
    val byTerm = grams.map(t => t.term -> t).toMap
    assert(byTerm("man_of").position === byTerm("man").position)
    assert(byTerm("of_the").position === byTerm("of").position)
    assert(byTerm("man_of").startOff === byTerm("man").startOff &&
      byTerm("man_of").endOff === byTerm("of").endOff)
    // a position gap breaks adjacency: no gram across a removed stop word
    val gap = toks("man of the year", stop = Set("of"))
    val got2 = TokenFilters.commonGrams(gap, Set("the")).map(_.term).toSeq
    assert(got2 == Seq("man", "the", "the_year", "year"))
  }

  test("reverse: codepoint-safe") {
    assert(TokenFilters.reverse("merge") == "egrem")
    assert(TokenFilters.reverse("a𝔊b") == "b𝔊a") // surrogate pair intact
  }

  test("truncate / capitalize / length / limit") {
    val ts = toks("abcdef gh i")
    assert(TokenFilters.truncate(ts, 3).map(_.term).toSeq == Seq("abc", "gh", "i"))
    assert(TokenFilters.capitalize("mcDONald") == "Mcdonald")
    assert(TokenFilters.lengthFilter(ts, 2, 5).map(_.term).toSeq == Seq("gh"))
    // dropped tokens leave their position gap (FilteringTokenFilter)
    assert(TokenFilters.lengthFilter(ts, 2, 5).head.position == 1)
    assert(TokenFilters.limitTokenCount(ts, 2).map(_.term).toSeq == Seq("abcdef", "gh"))
  }

  test("stemWithOriginal: original + stem at one position, identity deduped") {
    val ts = toks("merging by")
    val got = TokenFilters.stemWithOriginal(ts, PorterStemmer.stem)
      .map(t => (t.term, t.position)).toSeq
    assert(got == Seq(("merging", 0), ("merg", 0), ("by", 1)))
  }

  test("dictionaryCompound: brute-force subwords, original first, start-asc order") {
    val dict = Set("donau", "dampf", "schiff", "fahrt")
    val ts = toks("donaudampfschifffahrt ahoi")
    val got = TokenFilters.dictionaryCompound(ts, dict)
      .map(t => (t.term, t.position)).toSeq
    // the doc-comment example: compound + its parts at one position;
    // the short non-compound token passes through untouched
    assert(got == Seq(("donaudampfschifffahrt", 0), ("donau", 0),
      ("dampf", 0), ("schiff", 0), ("fahrt", 0), ("ahoi", 1)))
    // subwords keep the ORIGINAL word's offsets (>=4.4 semantics)
    val orig = ts.head
    TokenFilters.dictionaryCompound(ts, dict).take(5).foreach { t =>
      assert(t.startOff == orig.startOff && t.endOff == orig.endOff)
    }
  }

  test("dictionaryCompound: onlyLongestMatch keeps one hit per start") {
    val dict = Set("schiff", "schifffahrt", "fahrt")
    val ts = toks("schifffahrt")
    val all = TokenFilters.dictionaryCompound(ts, dict).map(_.term).toSeq
    assert(all == Seq("schifffahrt", "schiff", "schifffahrt", "fahrt"))
    val longest = TokenFilters.dictionaryCompound(ts, dict,
      onlyLongestMatch = true).map(_.term).toSeq
    assert(longest == Seq("schifffahrt", "schifffahrt", "fahrt"))
  }

  test("dictionaryCompound: minWordSize gate and subword-size bounds") {
    val dict = Set("rind", "dampf", "schifffahrt")
    // len-4 token < minWordSize(5): not decomposed even though in dict
    assert(TokenFilters.dictionaryCompound(toks("rind"), dict)
      .map(_.term).toSeq == Seq("rind"))
    // a len-5 dictionary word re-emits itself as its own subword
    // (reference brute force includes i=0, j=len — the documented quirk)
    assert(TokenFilters.dictionaryCompound(toks("dampf"), dict)
      .map(_.term).toSeq == Seq("dampf", "dampf"))
    // subwords longer than maxSubwordSize are never found
    assert(TokenFilters.dictionaryCompound(toks("schifffahrt"), dict,
      maxSubwordSize = 8).map(_.term).toSeq == Seq("schifffahrt"))
  }
}
