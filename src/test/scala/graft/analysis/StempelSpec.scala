package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import Stempel._

/** Hand-traced vectors for the Egothor patch machinery (reference:
  * Lucene.Net.Analysis.Stempel/Egothor.Stemmer/Diff.cs, Trie.cs,
  * Stempel/StempelStemmer.cs). */
class StempelSpec extends AnyFunSuite {

  test("applyPatch: the four commands, end-first cursor") {
    assert(applyPatch("running", "Dc") === "runn")      // delete 3 at end
    assert(applyPatch("flies", "DcIy") === "fly")       // delete 3, insert y
    assert(applyPatch("happy", "Ri") === "happi")       // replace last
    assert(applyPatch("xza", "-aRb") === "xba")         // skip 1, replace
    assert(applyPatch("ab", "Dz") === "ab")             // out of range: abort
    assert(applyPatch("", "Da") === "")                 // empty dest: no-op
    assert(applyPatch("word", null) === "word")
  }

  test("diff generates minimal end-first patches; apply(a, diff(a,b)) == b") {
    assert(diff("running", "runn") === "Dc")
    assert(diff("flies", "fly") === "DbRy")
    assert(diff("abcde", "abXde") === "-bRX")           // interior edit skips
    val pairs = Seq(
      "running" -> "runn", "flies" -> "fly", "agreed" -> "agre",
      "abcde" -> "abXde", "kot" -> "kotek", "kotek" -> "kot",
      "pisze" -> "pisać", "a" -> "b", "abc" -> "abc", "x" -> "xyz")
    for ((a, b) <- pairs)
      assert(applyPatch(a, diff(a, b)) === b, s"roundtrip $a -> $b")
  }

  test("reversed-key trie: last-on-path = longest stored suffix pattern") {
    val t = new Trie()
      .add("ing", "Dc").add("ies", "DcIy").add("ed", "Db")
      .add("s", "Da").add("y", "Ri")
    assert(stem(t, "running") === "runn")
    assert(stem(t, "armies") === "army")   // 'ies' (depth 3) beats 's'
    assert(stem(t, "things") === "thing")  // plain 's' when not 'ies'
    assert(stem(t, "agreed") === "agre")
    assert(stem(t, "happy") === "happi")
    assert(stem(t, "word") === null)       // no path
    assert(stem(t, "ing") === null)        // stems to empty => null
    // filter: minLength guard + null keeps original (StempelFilter.cs:77-85)
    assert(filterTerm(t, "was") === "was")
    assert(filterTerm(t, "word") === "word")
    assert(filterTerm(t, "running") === "runn")
  }

  test("train: tables from (inflected, lemma) pairs generalize by suffix") {
    val t = train(Seq("flies" -> "fly"))
    assert(stem(t, "flies") === "fly")
    assert(stem(t, "dragonflies") === "dragonfly")
  }
}
