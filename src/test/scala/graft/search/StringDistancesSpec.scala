package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Vectors for the pluggable spell-checker distances. JW/NGram values
  * are hand-traced through the reference algorithms (and the JW quirk
  * case is asserted to DIFFER from the classic Winkler, proving the
  * reference's min(0.1, 1/maxLen) + uncapped-prefix departures are
  * reproduced, not the textbook formula). */
class StringDistancesSpec extends AnyFunSuite {
  private def close(a: Double, b: Double) = assert(math.abs(a - b) < 1e-9, s"$a vs $b")

  test("LevensteinDistance: 1 - d/max, empty-string edges") {
    close(StringDistances.levenshteinSim("kitten", "sitting"), 1.0 - 3.0 / 7)
    close(StringDistances.levenshteinSim("mergee", "merge"), 1.0 - 1.0 / 6)
    close(StringDistances.levenshteinSim("same", "same"), 1.0)
    close(StringDistances.levenshteinSim("", ""), 1.0)
    close(StringDistances.levenshteinSim("a", ""), 0.0)
  }

  test("JaroWinkler: classic-agreeing vectors") {
    close(StringDistances.jaroWinkler("MARTHA", "MARHTA"), 0.9611111111111111)
    close(StringDistances.jaroWinkler("DIXON", "DICKSONX"), 0.8133333333333332)
    close(StringDistances.jaroWinkler("mergee", "merge"), 0.9722222222222223)
    close(StringDistances.jaroWinkler("abc", "abc"), 1.0)
    close(StringDistances.jaroWinkler("abc", "xyz"), 0.0)
  }

  test("JaroWinkler: the reference's scaling/prefix departures from classic Winkler") {
    // prefix = 11 (> the classic cap of 4), maxLen = 14 (> 10 so the
    // classic flat 0.1 would overshoot 1/maxLen): reference algorithm
    // gives 0.994898; the textbook Winkler (DuckDB) gives 0.985714.
    close(StringDistances.jaroWinkler("implementation", "implementatoin"),
      0.9948979591836735)
    assert(math.abs(StringDistances.jaroWinkler("implementation", "implementatoin")
      - 0.9857142857142858) > 1e-3, "must NOT equal the classic Winkler value")
  }

  test("NGramDistance (n=2): DP with padded grams + short-string branch") {
    close(StringDistances.ngram(2)("kitten", "sitting"), 0.5)
    close(StringDistances.ngram(2)("mergee", "merge"), 1.0 - 1.0 / 6)
    // sub-n branch: positional match ratio, NOT 1 - cost (reference quirk)
    close(StringDistances.ngram(2)("ab", "a"), 0.5)
    close(StringDistances.ngram(2)("", ""), 1.0)
    close(StringDistances.ngram(2)("", "x"), 0.0)
  }

  test("LuceneLevenshtein: OSA transpositions over codepoints, 1 - d/min") {
    close(StringDistances.luceneLevenshtein("mergee", "merge"), 1.0 - 1.0 / 5)
    // one adjacent transposition costs 1, not 2
    close(StringDistances.luceneLevenshtein("abc", "acb"), 1.0 - 1.0 / 3)
    // OSA (not full Damerau): ca->abc is 3 edits, similarity goes negative
    close(StringDistances.luceneLevenshtein("ca", "abc"), 1.0 - 3.0 / 2)
    // supplementary-plane codepoints count once
    close(StringDistances.luceneLevenshtein("a😀b", "ab"), 1.0 - 1.0 / 2)
    // documented empty-string quirk: raw LENGTH, not a similarity
    close(StringDistances.luceneLevenshtein("abc", ""), 3.0)
    close(StringDistances.luceneLevenshtein("", ""), 0.0)
  }
}
