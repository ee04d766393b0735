package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Liang hyphenation + HyphenationCompoundWordTokenFilter vectors
  * (reference: Compound/Hyphenation/HyphenationTree.cs,
  * HyphenationCompoundWordTokenFilter.cs). */
class HyphenationSpec extends AnyFunSuite {

  test("the classic: hy-phen-ation from Liang's pattern subset") {
    // the canonical TeX example — interletter max-merge across 9 patterns
    val h = new Hyphenator(Seq("hy3ph", "he2n", "hena4", "hen5at", "1na",
      "n2at", "1tio", "2io", "o2n"))
    assert(h.hyphenate("hyphenation").get.toSeq === Seq(0, 2, 6, 11))
  }

  test("odd values break, even values inhibit; '.' anchors at boundaries") {
    // .a anchors only at the word start: "ab1c" vs ".ab1c"
    val anchored = new Hyphenator(Seq(".ab1c"))
    assert(anchored.hyphenate("abcabc").get.toSeq === Seq(0, 2, 6))
    val free = new Hyphenator(Seq("ab1c"))
    assert(free.hyphenate("abcabc").get.toSeq === Seq(0, 2, 5, 6))
    // a higher EVEN value suppresses a lower odd one at the same gap
    val inhibited = new Hyphenator(Seq("ab1c", "b4c"))
    assert(inhibited.hyphenate("abcabc") === None)
  }

  test("remain/push bounds clamp break points") {
    val h = new Hyphenator(Seq("a1a"))
    assert(h.hyphenate("aaaa", 1, 1).get.toSeq === Seq(0, 1, 2, 3, 4))
    assert(h.hyphenate("aaaa", 2, 2).get.toSeq === Seq(0, 2, 4))
    assert(h.hyphenate("aa", 1, 1).get.toSeq === Seq(0, 1, 2)) // len == remain+push still runs
    assert(h.hyphenate("a", 1, 1) === None) // len < remain + push → null
  }

  test("exceptions bypass patterns (strict push bound, as in the reference)") {
    val h = new Hyphenator(Seq("a1a"), exceptions = Map("tafel" -> Seq(2)))
    assert(h.hyphenate("tafel").get.toSeq === Seq(0, 2, 5))
    // exception with a point at len - push is dropped (strict <)
    val edge = new Hyphenator(Seq.empty, exceptions = Map("abcd" -> Seq(3)))
    assert(edge.hyphenate("abcd") === None)
  }

  private def t(s: String) = Token(s, 0, 0, s.length)
  private def terms(ts: Array[Token]) = ts.map(_.term).toSeq

  test("compound: no dictionary emits every sized subword between points") {
    val h = new Hyphenator(Seq("n1b", "k1s")) // daten|bank|system
    val out = Hyphenation.hyphenationCompound(Array(t("datenbanksystem")), h)
    assert(terms(out) === Seq("datenbanksystem", // original first
      "daten", "datenbank", "datenbanksystem",   // start 0 (whole word: <= max)
      "bank", "banksystem",                      // start 5
      "system"))                                 // start 9
    assert(out.forall(x => x.position == 0 && x.startOff == 0 &&
      x.endOff == 15)) // same-position overlap, original offsets
  }

  test("compound: dictionary gate + onlyLongestMatch") {
    val h = new Hyphenator(Seq("n1b", "k1s"))
    val dict = Set("daten", "bank", "system", "datenbank")
    val gated = Hyphenation.hyphenationCompound(
      Array(t("datenbanksystem")), h, Some(dict))
    assert(terms(gated) ===
      Seq("datenbanksystem", "daten", "datenbank", "bank", "system"))
    val longest = Hyphenation.hyphenationCompound(
      Array(t("datenbanksystem")), h, Some(dict), onlyLongestMatch = true)
    assert(terms(longest) ===
      Seq("datenbanksystem", "datenbank", "bank", "system"))
  }

  test("compound: the partLength-1 linking-morpheme fallback") {
    val h = new Hyphenator(Seq("s1z")) // verkehrs|zeichen
    val out = Hyphenation.hyphenationCompound(
      Array(t("verkehrszeichen")), h, Some(Set("verkehr", "zeichen")))
    assert(terms(out) === Seq("verkehrszeichen", "verkehr", "zeichen"))
  }

  test("compound: unhyphenatable and short tokens pass through") {
    val h = new Hyphenator(Seq("n1b"))
    val out = Hyphenation.hyphenationCompound(
      Array(t("quartz"), t("ab")), h)
    assert(terms(out) === Seq("quartz", "ab"))
  }
}
