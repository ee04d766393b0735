package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import SmartCn._

/** Hand-traced vectors for the SmartChineseAnalyzer HHMM core
  * (reference: Lucene.Net.Analysis.SmartCn/HHMM/). Weight arithmetic
  * uses MAX = 2159997, smooth = 0.1, tiny = 1/MAX: with zero bigram
  * frequencies an edge out of a token with frequency f costs
  * -log((0.1*(1+f) + 0.9)/MAX), so every path = const + sum of
  * per-token out-weights — unigram(f=100) ~ 12.188, word(f=2000000)
  * ~ 2.38, f=0 ~ 14.586. */
class SmartCnSpec extends AnyFunSuite {

  private val digits = "零一二三四五六七八九"
  private val dict: Map[String, Int] =
    digits.map(c => c.toString -> 100).toMap ++
      Map("一二" -> 2000000, "一二三" -> 2000000, "四五" -> 2000000)

  test("segGraph: single hanzi always tokenized, dict words by prefix " +
       "extension, letter/digit runs collapse, markers close the graph") {
    val sc = new SmartCn(dict)
    val g = sc.segGraph("一二ab3")
    assert(g.map(t => (t.id, t.start, t.end)).toSet === Set(
      ("一", 0, 1), ("一二", 0, 2), ("二", 1, 2),
      (StringId, 2, 4), (NumberId, 4, 5),
      (StartId, -1, 0), (EndId, 5, 6)))
    // surface kept for placeholder tokens
    assert(g.find(_.id == StringId).get.surface === "ab")
    assert(g.find(_.id == NumberId).get.surface === "3")
    // unknown hanzi still gets a token with freq 0
    assert(sc.segGraph("臨").head.freq === 0)
  }

  test("edge weight matches BiSegGraph.cs:105-113 closed form") {
    val sc = new SmartCn(dict)
    val t1 = SegToken("一", "一", 0, 1, ChineseWord, 100)
    val t2 = SegToken("二", "二", 1, 2, ChineseWord, 100)
    // b=0: -log((0.1*101 + 0.9*(1-tiny)*0 ... ) = -log((10.1+0.9)/MAX)
    assert(math.abs(sc.edgeWeight(t1, t2) - math.log(2159997.0 / 11.0)) < 1e-9)
  }

  test("Viterbi picks the least-cost (greedy-longest here) segmentation") {
    val sc = new SmartCn(dict)
    assert(sc.segment("一二三四五").map(_.surface).toSeq ===
      Seq("一二三", "四五"))
    assert(sc.segment("一二四").map(_.surface).toSeq === Seq("一二", "四"))
    assert(sc.segment("六七").map(_.surface).toSeq === Seq("六", "七"))
    // space-like chars create gaps the successor rule jumps (:78-88)
    assert(sc.segment("一 二").map(_.surface).toSeq === Seq("一", "二"))
  }

  test("bigram frequency swings the split-vs-compound decision") {
    // f(一)=f(二)=2000000, f(一二)=0: split 14.58+2.38+2.38 beats
    // compound 14.58+14.58
    val d = Map("一" -> 2000000, "二" -> 2000000, "一二" -> 0)
    assert(new SmartCn(d).segment("一二").map(_.surface).toSeq ===
      Seq("一", "二"))
    // bigram(始##始, 一二) = 1 with f(始)=0 makes the START edge cost
    // -log(~0.9) ~ 0.105: compound 0.105+14.586 now beats the split
    val sc2 = new SmartCn(d, Map((StartId, "一二") -> 1))
    assert(sc2.segment("一二").map(_.surface).toSeq === Seq("一二"))
  }

  test("sentence tokenizer: punctuation-inclusive splits, double-space " +
       "rule, leading spaces skipped (SentenceTokenizer.cs:63-125)") {
    val sc = new SmartCn(dict)
    assert(sc.sentences("一二。三四！ 五六") === Seq(
      ("一二。", 0, 3), ("三四！", 3, 6), ("五六", 7, 9)))
    // two consecutive spaces end the sentence; the first stays in text
    assert(sc.sentences("一  二") === Seq(("一 ", 0, 3), ("二", 3, 4)))
    // full pipeline: per-sentence HHMM with global offsets/positions;
    // the 。 delimiter token normalizes to ','
    val ts = sc.analyzeSentences("一二。三四")
    assert(ts.map(t => (t.term, t.position, t.startOff, t.endOff)).toSeq ===
      Seq(("一二", 0, 0, 2), (",", 1, 2, 3), ("三", 2, 3, 4), ("四", 3, 4, 5)))
  }

  test("SegTokenFilter: fullwidth fold + lowercase + delimiter to comma") {
    val sc = new SmartCn(dict)
    val out = sc.analyze("ＡＢc１2。三")
    assert(out.map(_.term).toSeq === Seq("abc", "12", ",", "三"))
    assert(out.map(t => (t.startOff, t.endOff)).toSeq ===
      Seq((0, 3), (3, 5), (5, 6), (6, 7)))
    assert(out.map(_.position).toSeq === Seq(0, 1, 2, 3))
  }
}
