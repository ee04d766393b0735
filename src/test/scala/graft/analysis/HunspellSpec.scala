package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Hunspell subset (Dictionary.cs / Stemmer.cs / HunspellStemFilter.cs):
  * hand-authored .aff/.dic pair, every vector hand-traced through the
  * documented rule semantics. */
class HunspellSpec extends AnyFunSuite {

  private val aff =
    """# en-style test affixes
      |SFX D Y 4
      |SFX D   0     d          e
      |SFX D   y     ied        [^aeiou]y
      |SFX D   0     ed         [^ey]
      |SFX D   0     ed         [aeiou]y
      |SFX S Y 2
      |SFX S   y     ies        [^aeiou]y
      |SFX S   0     s          [^sxy]
      |PFX A Y 1
      |PFX A   0     re         .
      |PFX U N 1
      |PFX U   0     un         .
      |""".stripMargin

  private val dic =
    """7
      |hope/D
      |cry/DS
      |cries
      |walk/AD
      |cat/S
      |play/UD
      |box
      |""".stripMargin

  private lazy val dict = Hunspell.parse(aff, dic)

  test("parse: rule counts, cross-product flags, strip/affix/cond fields") {
    assert(dict.suffixes.length === 6 && dict.prefixes.length === 2)
    assert(dict.suffixes.forall(_.crossProduct)) // D and S headers say Y
    assert(dict.prefixes.find(_.flag == 'A').get.crossProduct)
    assert(!dict.prefixes.find(_.flag == 'U').get.crossProduct)
    val ied = dict.suffixes.find(_.affix == "ied").get
    assert(ied.strip === "y" && ied.cond === "[^aeiou]y")
    assert(dict.words("walk") === Set('A', 'D') && dict.words("box") === Set.empty)
  }

  test("suffix stripping with condition classes") {
    assert(Hunspell.stem(dict, "hoped") === Seq("hope"))   // 0/d/e
    assert(Hunspell.stem(dict, "cried") === Seq("cry"))    // y/ied/[^aeiou]y
    assert(Hunspell.stem(dict, "played") === Seq("play"))  // 0/ed/[aeiou]y
    assert(Hunspell.stem(dict, "walked") === Seq("walk"))  // 0/ed/[^ey]
    assert(Hunspell.stem(dict, "cats") === Seq("cat"))     // 0/s/[^sxy]
    // condition failure: 'box' ends in x, excluded by [^sxy]
    assert(Hunspell.stem(dict, "boxs") === Seq.empty)
    // flag check: 'cat' has no D, so 'cated' finds nothing
    assert(Hunspell.stem(dict, "cated") === Seq.empty)
  }

  test("direct lookup comes first; prefix and cross-product stripping") {
    assert(Hunspell.stem(dict, "walk") === Seq("walk"))   // itself
    assert(Hunspell.stem(dict, "rewalk") === Seq("walk")) // PFX A
    // prefix AND suffix simultaneously: only via cross-product, both flags
    assert(Hunspell.stem(dict, "rewalked") === Seq("walk"))
    // U is NOT cross-product: un+play+ed must NOT resolve...
    assert(Hunspell.stem(dict, "unplayed") === Seq.empty)
    // ...while the plain U prefix strip works
    assert(Hunspell.stem(dict, "unplay") === Seq("play"))
    // direct entry + suffix stem, in Stemmer.Stem order
    assert(Hunspell.stem(dict, "cries") === Seq("cries", "cry"))
  }

  test("dic morphological fields are cut at the first tab/space (Dictionary.cs:828-840)") {
    val d = Hunspell.parse(aff,
      "3\ndrink/S\tpo:verb\nswim/D is:gerund st:swim\nrun po:verb\n")
    assert(d.words("drink") === Set('S'), "flags stop at the tab")
    assert(d.words("swim") === Set('D'), "flags stop at the space")
    assert(d.words.contains("run") && d.words("run") === Set.empty,
      "morph fields on a flagless entry don't swallow the word")
    assert(Hunspell.stem(d, "drinks") === Seq("drink"))
  }

  test("affix '0/XY' is the ZERO affix (continuation strip before the 0 check)") {
    val d = Hunspell.parse(
      "SFX X Y 2\nSFX X   a   0/YZ   .\nSFX X   0   s      .\n",
      "2\nword/X\nworda/X\n")
    // the zero-affix rule parses to an empty affix, NOT the literal "0":
    // 'word0' must not be treated as strip-0-add-a of 'worda'
    assert(d.suffixes.map(_.affix).sorted === Seq("", "s"))
    assert(Hunspell.stem(d, "word0") === Seq.empty)
    assert(Hunspell.stem(d, "words") === Seq("word"))
  }

  test("mid-class '-' in a condition is a literal, not a regex range") {
    // hunspell bracket conditions are literal char lists: [o-u]t means
    // {o,'-',u} before t — the reference escapes '-' (Dictionary.cs:461)
    val d = Hunspell.parse(
      "SFX T Y 1\nSFX T   0   ing   [o-u]t\n", "2\nadapt/T\nshoot/T\n")
    // 'adapt' ends in 'pt': p is inside the o..u RANGE but not the literal
    // set, so 'adapting' must NOT stem; 'shoot' ends 'ot' and must
    assert(Hunspell.stem(d, "adapting") === Seq.empty)
    assert(Hunspell.stem(d, "shooting") === Seq("shoot"))
  }

  test("filter: unknown unchanged, first stem replaces, rest overlap; longestOnly") {
    val toks = "zzz cries walked".split(' ').zipWithIndex
      .map { case (t, i) => Token(t, i, 0, t.length) }
    val out = Hunspell.filter(dict)(toks).map(t => (t.term, t.position)).toSeq
    assert(out === Seq(("zzz", 0), ("cries", 1), ("cry", 1), ("walk", 2)))
    val outL = Hunspell.filter(dict, longestOnly = true)(toks)
      .map(t => (t.term, t.position)).toSeq
    assert(outL === Seq(("zzz", 0), ("cries", 1), ("walk", 2)))
  }
}
