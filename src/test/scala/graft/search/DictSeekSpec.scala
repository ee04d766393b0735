package graft.search

import org.scalatest.funsuite.AnyFunSuite

/** Pure-function checks for the dictionary-seek ranges: the fuzzy
  * range banding must be a sound SUPERSET (never excludes a true match;
  * exactness comes from the residual levenshtein filter), and should
  * genuinely prune (not degenerate to the whole space). */
class DictSeekSpec extends AnyFunSuite {

  private def editDist(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def covered(w: String, ranges: Seq[(String, String)]): Boolean =
    ranges.exists { case (lo, hi) => w >= lo && (hi == null || w < hi) }

  // every string over {a,b,c} up to length 4 — an exhaustive mini-dictionary
  private val alphabet = "abc".toCharArray.toSeq
  private val dict: Seq[String] = {
    def gen(n: Int): Seq[String] =
      if (n == 0) Seq("") else gen(n - 1).flatMap(s => alphabet.map(c => s + c))
    (0 to 4).flatMap(gen).distinct
  }

  test("fuzzy ranges are a sound superset over an exhaustive dictionary") {
    for (q <- Seq("ab", "abc", "ba", "cab", "abcd", "a"); e <- Seq(1, 2)) {
      val Some(ranges) = DictSeek.fuzzyRanges(q, e, alphabet)
      val misses = dict.filter(w => editDist(w, q) <= e && !covered(w, ranges))
      assert(misses.isEmpty, s"q=$q e=$e uncovered: $misses ranges=$ranges")
    }
  }

  test("fuzzy ranges prune: far-away subtrees are excluded") {
    // dictionary alphabet wider than the query's chars — subtrees two
    // wrong chars deep must fall outside every range for maxEdits=1
    val wide = "abcdmergx".toCharArray.toSeq
    val Some(ranges) = DictSeek.fuzzyRanges("merge", 1, wide)
    for (w <- Seq("ab", "abab", "ddcc", "ccccc", "xx", "xgerm"))
      assert(!covered(w, ranges), s"$w should be pruned (2+ leading edits)")
    // while true matches stay covered, wherever the edit lands (first
    // chars drawn from the declared dictionary alphabet)
    for (w <- Seq("merge", "merg", "mergee", "xerge", "merga", "emerge", "erge"))
      assert(covered(w, ranges), s"$w is within 1 edit and must be covered")
  }

  test("maxEdits=2 banding stays sound for double-front-edit candidates") {
    val wide = "abcdmergx".toCharArray.toSeq
    DictSeek.fuzzyRanges("merge", 2, wide) match {
      case Some(ranges) =>
        // every within-2 candidate whose first char is in the alphabet
        // must be covered, wherever the two edits land
        for (w <- Seq("merge", "rge", "aerge", "mergeab", "xxrge", "abrge",
          "mexxe", "dderge", "emerge", "cmerge"))
          if (editDist(w, "merge") <= 2)
            assert(covered(w, ranges), s"$w within 2 edits must be covered")
      case None => () // explosion fallback is acceptable for e=2
    }
  }

  test("wildcard and regexp literal prefixes") {
    assert(DictSeek.wildcardPrefix("ana*") === "ana")
    assert(DictSeek.wildcardPrefix("foo*bar") === "foo")
    assert(DictSeek.wildcardPrefix("f?o") === "f")
    assert(DictSeek.wildcardPrefix("*x") === "")
    assert(DictSeek.regexpPrefix("ve.tor") === "ve")
    assert(DictSeek.regexpPrefix("abc") === "abc")
    assert(DictSeek.regexpPrefix("ab*c") === "a")   // 'b' is quantified
    assert(DictSeek.regexpPrefix("ab?c") === "a")
    assert(DictSeek.regexpPrefix("(ab)c") === "")
    assert(DictSeek.regexpPrefix("a\\d") === "a")
    // a TOP-LEVEL alternation makes the leading literal OPTIONAL — no
    // prefix at all, or `foo|bar` would range-exclude every 'bar' match
    assert(DictSeek.regexpPrefix("foo|bar") === "")
    // …but a GROUPED alternation cannot reach past its parens: the
    // literals before the group stay mandatory and still seek
    assert(DictSeek.regexpPrefix("fo(o|b)ar") === "fo")
    assert(DictSeek.regexpPrefix("lang:(?:scala|java)") === "lang:")
    // class-contained and escaped pipes are literals, not alternations
    assert(DictSeek.regexpPrefix("ab[|]c") === "ab")
    assert(DictSeek.regexpPrefix("ab\\|c") === "ab")
    // unbalanced close degrades to conservative no-prefix
    assert(DictSeek.regexpPrefix(")a|b") === "")
  }

  test("succ produces the least upper bound of a prefix subtree") {
    assert(DictSeek.succ("ana") === "anb")
    assert(DictSeek.succ("z") === "{")
    assert(DictSeek.succ("a￿") === "b")
    assert(DictSeek.succ("￿") === null)
    // every string with the prefix sorts below succ
    for (s <- Seq("ana", "anazzz", "ana￿￿"))
      assert(s < DictSeek.succ("ana"))
  }
}
