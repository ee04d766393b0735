package graft.search

import graft.analysis.Analyzer
import org.scalatest.funsuite.AnyFunSuite

class HighlighterSpec extends AnyFunSuite {
  private val a = Analyzer.standard

  test("marks the query term with original-offset fidelity") {
    val f = Highlighter.bestFragment(a, "Alpha MERGE beta", Set("merge"), 12).get
    assert(f.text === "Alpha <b>MERGE</b> beta") // original casing preserved
    assert(f.hits === 1)
  }

  test("picks the densest window") {
    val text = ("x " * 30) + "merge sort merge" + (" y" * 30)
    val f = Highlighter.bestFragment(a, text, Set("merge"), windowTokens = 4).get
    assert(f.hits === 2)
    assert(f.text.contains("<b>merge</b> sort <b>merge</b>"))
  }

  test("multiple query terms counted together") {
    val f = Highlighter.bestFragment(a,
      "alpha merge vector beta", Set("merge", "vector"), 12).get
    assert(f.hits === 2)
    assert(f.text === "alpha <b>merge</b> <b>vector</b> beta")
  }

  test("no hit → None; empty text → None") {
    assert(Highlighter.bestFragment(a, "alpha beta", Set("zzz")).isEmpty)
    assert(Highlighter.bestFragment(a, "", Set("x")).isEmpty)
  }

  test("fragment bounded by window even in long docs") {
    val text = ("word " * 200) + "merge" + (" tail" * 200)
    val f = Highlighter.bestFragment(a, text, Set("merge"), windowTokens = 8).get
    assert(f.text.split("\\s+").length <= 9)
    assert(f.text.contains("<b>merge</b>"))
  }

  test("offsets highlighter survives overlapping/nested hits (preserveOriginal analyzers)") {
    // nested (0,17) original + (0,5)/(5,9) sub-words: keep disjoint hits,
    // drop the overlapping original — no crash, clean markup
    val f = Highlighter.bestFragmentFromOffsets("parseHTTPResponse x",
      Seq((0, 17), (0, 5), (5, 9)), 80).get
    assert(f.hits === 2)
    assert(f.text === "<b>parse</b><b>HTTP</b>")
  }
}
