package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import Tokenizers._

class TokenizersSpec extends AnyFunSuite {

  test("pathHierarchy: prefix paths, offsets, trailing delimiter, skip, " +
       "replacement (Path/PathHierarchyTokenizer.cs)") {
    assert(pathHierarchy("/a/b/c").map(t => (t.term, t.startOff, t.endOff)).toSeq ===
      Seq(("/a", 0, 2), ("/a/b", 0, 4), ("/a/b/c", 0, 6)))
    assert(pathHierarchy("a/b/c").map(_.term).toSeq === Seq("a", "a/b", "a/b/c"))
    // trailing delimiter emits a delimiter-terminated final token
    assert(pathHierarchy("/a/b/c/").map(_.term).toSeq ===
      Seq("/a", "/a/b", "/a/b/c", "/a/b/c/"))
    // skip drops leading parts, startOffset moves past them
    assert(pathHierarchy("/a/b/c", skip = 1).map(t => (t.term, t.startOff, t.endOff)).toSeq ===
      Seq(("/b", 2, 4), ("/b/c", 2, 6)))
    assert(pathHierarchy("a/b/c", skip = 1).map(t => (t.term, t.startOff)).toSeq ===
      Seq(("/b", 1), ("/b/c", 1)))
    // skipping every part yields nothing
    assert(pathHierarchy("/a/b/c", skip = 3).isEmpty)
    // replacement substitutes the delimiter in output text only
    assert(pathHierarchy("c:\\x\\y", delimiter = '\\', replacement = '/')
      .map(_.term).toSeq === Seq("c:", "c:/x", "c:/x/y"))
  }

  test("reversePathHierarchy: suffix paths; skip trims parts off the END " +
       "keeping the trailing delimiter (ReversePathHierarchyTokenizer.cs)") {
    assert(reversePathHierarchy("/a/b/c").map(t => (t.term, t.startOff, t.endOff)).toSeq ===
      Seq(("/a/b/c", 0, 6), ("a/b/c", 1, 6), ("b/c", 3, 6), ("c", 5, 6)))
    assert(reversePathHierarchy("/a/b/c", skip = 1).map(_.term).toSeq ===
      Seq("/a/b/", "a/b/", "b/"))
    assert(reversePathHierarchy("c", skip = 1).isEmpty)
  }

  test("keepWords / byType / trim") {
    val ts = Array(Token("keep", 0, 0, 4), Token("drop", 1, 5, 9))
    assert(keepWords(ts, Set("keep")).map(_.term).toSeq === Seq("keep"))
    val rs = Array(RawToken("ab", 0, 2, "<ALPHANUM>"), RawToken("12", 3, 5, "<NUM>"))
    assert(byType(rs, Set("<NUM>")).map(_.term).toSeq === Seq("ab"))
    assert(byType(rs, Set("<NUM>"), useWhitelist = true).map(_.term).toSeq === Seq("12"))
    assert(trim(Array(Token(" x ", 0, 0, 3))).head.term === "x")
  }

  test("positionFilter: all tokens stack at the first position (incr 0) " +
       "or advance by a constant") {
    val ts = Array(Token("a", 0, 0, 1), Token("b", 1, 2, 3), Token("c", 2, 4, 5))
    assert(positionFilter(ts).map(_.position).toSeq === Seq(0, 0, 0))
    assert(positionFilter(ts, 1).map(_.position).toSeq === Seq(0, 1, 2))
  }

  test("urlEmailTokenize: URLs and emails as single typed tokens, UAX#29 " +
       "between (Standard/UAX29URLEmailTokenizer.cs)") {
    val ts = urlEmailTokenize("see https://ex.com/a?b=1#f and mail bob@ex.co.uk now")
    assert(ts.map(t => (t.term, t.tpe)).toSeq === Seq(
      ("see", "<ALPHANUM>"),
      ("https://ex.com/a?b=1#f", "<URL>"),
      ("and", "<ALPHANUM>"), ("mail", "<ALPHANUM>"),
      ("bob@ex.co.uk", "<EMAIL>"),
      ("now", "<ALPHANUM>")))
    // www-led hosts count as URLs; offsets are global
    val ws = urlEmailTokenize("x www.a.org y")
    assert(ws.map(t => (t.term, t.tpe, t.startOff, t.endOff)).toSeq === Seq(
      ("x", "<ALPHANUM>", 0, 1), ("www.a.org", "<URL>", 2, 11),
      ("y", "<ALPHANUM>", 12, 13)))
    // an email inside a URL is not re-matched (longest/first wins)
    assert(urlEmailTokenize("ftp://u@h.com/p").map(_.tpe).toSeq === Seq("<URL>"))
  }
}
