package graft.analysis

import java.util.Locale
import org.scalatest.funsuite.AnyFunSuite

/** Collation keys realize locale order under plain string comparison
  * (reference surface: ICUCollationKeyAnalyzer/Filter — index-time sort
  * key generation). */
class CollationSpec extends AnyFunSuite {

  private def sortedByKeys(locale: Locale, words: Seq[String]): Seq[String] = {
    val c = Collation.collator(locale)
    words.sortBy(w => Collation.keyFor(c, w))
  }

  test("key order == collator order (property over a mixed word list)") {
    val words = Seq("zebra", "Übung", "apfel", "Ärger", "öl", "oase", "strasse",
      "straße", "tzone", "töne", "Zoo", "umlaut")
    for (loc <- Seq(Locale.GERMAN, Locale.ENGLISH, new Locale("sv"))) {
      val c = Collation.collator(loc)
      val byKey = sortedByKeys(loc, words)
      val byCollator = words.sortWith((a, b) => c.compare(a, b) < 0)
      assert(byKey === byCollator, s"locale $loc")
    }
  }

  test("German: ö sorts with o (before z), opposite of codepoint order") {
    val de = Collation.collator(Locale.GERMAN)
    assert(de.compare("töne", "tzone") < 0)
    assert("töne" > "tzone") // raw codepoints disagree
    assert(Collation.keyFor(de, "töne") < Collation.keyFor(de, "tzone"))
  }

  test("Swedish: ö sorts after z — same words, different locale, different order") {
    val sv = Collation.collator(new Locale("sv"))
    assert(sv.compare("övre", "zebra") > 0)
    assert(Collation.keyFor(sv, "övre") > Collation.keyFor(sv, "zebra"))
    val de = Collation.collator(Locale.GERMAN)
    assert(Collation.keyFor(de, "övre") < Collation.keyFor(de, "zebra"))
  }

  test("keyAnalyzer drops keys into the chain (terms become comparable keys)") {
    val a = Collation.keyAnalyzer(Locale.GERMAN)
    val terms = a.analyzeTerms("öl zebra")
    assert(terms.length === 2)
    assert(terms(0) < terms(1)) // öl before zebra under de, as raw strings
    assert(terms.forall(_.matches("[0-9a-f]+")))
  }
}
