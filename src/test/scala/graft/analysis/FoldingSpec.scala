package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Diacritic/compatibility folding (ICUFoldingFilter /
  * ASCIIFoldingFilter analog) and the folding analyzer chain that
  * replaces the old ASCII-duplicate stop-list hack. */
class FoldingSpec extends AnyFunSuite {

  test("fold strips diacritics via NFKD") {
    assert(Folding.fold("café") === "cafe")
    assert(Folding.fold("müller") === "muller")
    assert(Folding.fold("está") === "esta")
    assert(Folding.fold("für") === "fur")
    assert(Folding.fold("łódź") === "lodz")
    assert(Folding.fold("naïve") === "naive")
    assert(Folding.fold("señor") === "senor")
  }

  test("fold maps the non-decomposable Latin specials") {
    assert(Folding.fold("straße") === "strasse")
    assert(Folding.fold("œuvre") === "oeuvre")
    assert(Folding.fold("ærø") === "aero")
    assert(Folding.fold("þorn") === "thorn")
  }

  test("fold handles compatibility forms (NFKD), is idempotent, ASCII-identity") {
    assert(Folding.fold("ﬁle") === "file") // ﬁ ligature
    val terms = Seq("café", "straße", "łódź", "plain", "merge_sort", "x2")
    terms.foreach { t =>
      val once = Folding.fold(t)
      assert(Folding.fold(once) === once, s"idempotence for $t")
    }
    assert(Folding.fold("merge") === "merge")
    // Cyrillic survives folding untouched (no marks, no specials)
    assert(Folding.fold("россия") === "россия")
  }

  test("folding chain: accented AND unaccented spellings hit one stop entry") {
    val de = Analyzer.foldingForLang("de")
    // "für" (accented) and "fur" (informal unaccented) both stop out;
    // content words index folded
    assert(de.analyzeTerms("FÜR fur die Straße").toSeq === Seq("strasse"))
    val es = Analyzer.foldingForLang("es")
    assert(es.analyzeTerms("más mas sí si café").toSeq === Seq("cafe"))
    // the unfolded chain keeps pure Snowball entries only: accented stops
    // drop, unaccented variants now index as content terms
    val esPlain = Analyzer.forLang("es")
    assert(esPlain.analyzeTerms("más mas").toSeq === Seq("mas"))
  }

  test("folding chain keeps positions/offsets through the fold") {
    val de = Analyzer.foldingForLang("de")
    val toks = de.analyze("die Straße läuft").tokens
    assert(toks.map(_.term).toSeq === Seq("strasse", "lauft"))
    assert(toks.map(_.position).toSeq === Seq(1, 2)) // stop gap preserved
    assert(toks(0).startOff === 4 && toks(0).endOff === 10) // raw offsets
  }
}
