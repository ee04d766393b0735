package graft.search

import graft.analysis.Analyzer
import org.scalatest.funsuite.AnyFunSuite

/** QueryAutoStopWordAnalyzer wrapper contract: the derived stop terms are
  * POST-STEM index terms, so the reference composes its StopFilter around
  * the END of the delegate chain (QueryAutoStopWordAnalyzer.cs:150-170) —
  * after any stemmer — with StopFilter position-gap semantics. */
class AutoStopwordsSpec extends AnyFunSuite {

  private val delegate = Analyzer.englishStemming

  test("auto stop terms filter AFTER stemming, against index-term forms") {
    // the index holds stemmed terms: df('studi') is what the derivation
    // sees, so the auto set contains 'studi', never 'studies'
    val a = AutoStopwords.analyzer(delegate, Set("studi"))
    assert(delegate.analyzeTerms("studies run").toSeq === Seq("studi", "run"))
    assert(a.analyzeTerms("studies run").toSeq === Seq("run"))
    // a pre-stem stop slot would have missed it (no token 'studi' exists
    // before the stemmer) — regression for the stop-before-stem wiring
  }

  test("survivors keep their positions (trailing StopFilter gaps)") {
    val a = AutoStopwords.analyzer(delegate, Set("studi"))
    val d = a.analyze("studies run fast")
    assert(d.tokens.map(t => (t.term, t.position)).toSeq ===
      Seq(("run", 1), ("fast", 2))) // gap at position 0
    assert(d.length === 2 && d.numOverlap === 0)
  }

  test("empty auto set is the identity") {
    val a = AutoStopwords.analyzer(delegate, Set.empty)
    assert(a.analyzeTerms("studies run").toSeq ===
      delegate.analyzeTerms("studies run").toSeq)
  }
}
