package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import Synonyms._

/** Hand-traced vectors for the multi-word SynonymFilter
  * (Analysis/Synonym/SynonymFilter.cs). */
class SynonymsSpec extends AnyFunSuite {

  private def toks(ws: String*): Array[Token] = {
    var off = 0
    ws.zipWithIndex.map { case (w, i) =>
      val t = Token(w, i, off, off + w.length); off += w.length + 1; t
    }.toArray
  }

  test("expansion rule: outputs sausage across following positions " +
       "(SynonymFilter.cs:500-553)") {
    val m = new Builder()
      .add(Seq("dns"), Seq("domain", "name", "service"), includeOrig = true)
      .build()
    val out = filter(toks("visit", "dns", "now"), m)
    // slot 1: original dns + "domain"; slot 2: "now" stacked with "name";
    // slot 3 (beyond input): "service"
    assert(out.map(t => (t.term, t.position)).toSeq === Seq(
      ("visit", 0),
      ("dns", 1), ("domain", 1),
      ("now", 2), ("name", 2),
      ("service", 3)))
    // multi-word outputs carry posLength 1 and inherit the overlapped
    // input token's offsets (:536-543)
    val name = out.find(_.term == "name").get
    assert(name.posLength === 1)
    assert((name.startOff, name.endOff) === (10, 13)) // "now"'s offsets
  }

  test("contraction rule: single output spans the match " +
       "(endOffset = match end; posLength = N when keepOrig)") {
    val m = new Builder()
      .add(Seq("domain", "name", "service"), Seq("dns"), includeOrig = true)
      .build()
    val out = filter(toks("the", "domain", "name", "service", "failed"), m)
    assert(out.map(t => (t.term, t.position, t.posLength)).toSeq === Seq(
      ("the", 0, 1),
      ("domain", 1, 1), ("dns", 1, 3),
      ("name", 2, 1), ("service", 3, 1),
      ("failed", 4, 1)))
    val dns = out.find(_.term == "dns").get
    assert((dns.startOff, dns.endOff) === (4, 23)) // spans the 3 words
    // keepOrig=false: originals vanish, positions collapse
    val m2 = new Builder()
      .add(Seq("domain", "name", "service"), Seq("dns"), includeOrig = false)
      .build()
    assert(filter(toks("the", "domain", "name", "service", "failed"), m2)
      .map(t => (t.term, t.position)).toSeq ===
      Seq(("the", 0), ("dns", 1), ("failed", 2)))
  }

  test("greedy: earliest-longest wins, no parse restarts inside a match " +
       "(:34-47, :481)") {
    val m = new Builder()
      .add(Seq("a"), Seq("x"), includeOrig = false)
      .add(Seq("a", "b"), Seq("y"), includeOrig = false)
      .add(Seq("b", "c"), Seq("z"), includeOrig = false)
      .build()
    assert(filter(toks("a", "b", "c"), m).map(t => (t.term, t.position)).toSeq ===
      Seq(("y", 0), ("c", 1))) // "a b" beats "a"; "b c" never parses
  }

  test("SolrSynonymParser: equivalence with expand true/false, explicit " +
       "mappings, comments (SolrSynonymParser.cs)") {
    val m = parseSolr(
      """# comment
        |i-pod, ipod
        |foo bar => baz
        |""".stripMargin)
    assert(filter(toks("ipod"), m).map(_.term).toSeq === Seq("i-pod", "ipod"))
    assert(filter(toks("foo", "bar"), m).map(t => (t.term, t.position)).toSeq ===
      Seq(("baz", 0)))
    val noExpand = parseSolr("big, large, huge", expand = false)
    assert(filter(toks("large"), noExpand).map(_.term).toSeq === Seq("big"))
    assert(filter(toks("big"), noExpand).map(_.term).toSeq === Seq("big"))
  }
}
