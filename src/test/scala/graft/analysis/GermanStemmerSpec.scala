package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Caumanns German stemmer — reference vectors (TestGermanAnalyzer.cs)
  * + hand-traced phase coverage. */
class GermanStemmerSpec extends AnyFunSuite {

  test("reference vectors") {
    assert(GermanStemmer.stem("Tisch") == "tisch")
    assert(GermanStemmer.stem("Tische") == "tisch")
    assert(GermanStemmer.stem("Tischen") == "tisch")
    assert(GermanStemmer.stem("Schaltflächen") == "schaltflach")
  }

  test("phase behaviors") {
    // multi-char encodings survive stripping; the '*' double-letter mark
    // BLOCKS further stripping (geheimnisse keeps its protected ss)
    assert(GermanStemmer.stem("geheimnisse") == "geheimniss")
    assert(GermanStemmer.stem("geheimnis") == "geheimni")
    // trailing z → x (Katz/Katze conflate via katx)
    assert(GermanStemmer.stem("katz").endsWith("x"))
    assert(GermanStemmer.stem("katze") == GermanStemmer.stem("katz"))
    // doubled letters protected by '*' then restored
    assert(GermanStemmer.stem("kammer") == "kamm")
    // interior "gege" loses its first ge (particle denotion)
    assert(GermanStemmer.stem("gegeben") == GermanStemmer.stem("geben"))
    // non-letter input returned lowercased unstemmed
    assert(GermanStemmer.stem("B2B") == "b2b")
  }
}
