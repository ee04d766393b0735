package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import Kuromoji._

/** Hand-traced lattice-Viterbi vectors for the JapaneseTokenizer analog
  * (reference: Lucene.Net.Analysis.Kuromoji/JapaneseTokenizer.cs). The
  * lexicon uses the kanji digits 零一二三四五六七八九 (= 0-9, the same
  * alphabet as the CJK gate corpus). */
class KuromojiSpec extends AnyFunSuite {

  private val unigrams =
    "零一二三四五六七八九".map(c => JaEntry(c.toString, 0, 0, 1000))
  private val dict = unigrams ++ Seq(
    JaEntry("一二", 0, 0, 1500),
    JaEntry("一二三", 0, 0, 2000),
    JaEntry("四五", 0, 0, 1500))

  test("NORMAL: least-cost picks the longest multi-char entries") {
    val tok = new Kuromoji(dict)
    // [一二三][四五]: 2000+1500 = 3500 beats [一二][三][四五] 4000,
    // [一二][三][四][五] 4500 and all-unigrams 5000
    assert(tok.tokenize("一二三四五").map(_.term).toSeq ===
      Seq("一二三", "四五"))
    // trigram absent -> bigram: [一二][四] = 2500
    assert(tok.tokenize("一二四").map(_.term).toSeq === Seq("一二", "四"))
    // no multi-char match -> unigrams
    assert(tok.tokenize("六七").map(_.term).toSeq === Seq("六", "七"))
    // offsets are char offsets
    val ts = tok.tokenize("九一二三")
    assert(ts.map(t => (t.term, t.startOff, t.endOff)).toSeq ===
      Seq(("九", 0, 1), ("一二三", 1, 4)))
  }

  test("connection costs swing the split-vs-compound decision") {
    val d = Seq(
      JaEntry("一", 1, 1, 1000), JaEntry("二", 2, 2, 1000),
      JaEntry("一二", 3, 3, 2100))
    // conn 0: split 2000 < compound 2100
    assert(new Kuromoji(d).tokenize("一二").map(_.term).toSeq ===
      Seq("一", "二"))
    // conn(r=1 -> l=2) = 200: split 2200 > compound 2100
    assert(new Kuromoji(d, Map((1, 2) -> 200)).tokenize("一二")
      .map(_.term).toSeq === Seq("一二"))
    // BOS conn (rightId 0 -> leftId): taxing the compound's entry swings
    // it back: split 2200 < compound 2100+200
    assert(new Kuromoji(d, Map((1, 2) -> 200, (0, 3) -> 200))
      .tokenize("一二").map(_.term).toSeq === Seq("一", "二"))
  }

  test("SEARCH: all-kanji length-3 entry pays (3-2)*3000 and decomposes") {
    val tok = new Kuromoji(dict, mode = Search)
    // tri 2000+3000=5000 loses to [一二][三]=2500 (bigrams pay nothing)
    assert(tok.tokenize("一二三").map(_.term).toSeq === Seq("一二", "三"))
    // NORMAL keeps the trigram
    assert(new Kuromoji(dict).tokenize("一二三").map(_.term).toSeq ===
      Seq("一二三"))
  }

  test("SEARCH compound output: penalized winner stacks over its 2nd-best " +
       "decomposition (posIncr 0, posLength = #subs)") {
    val d = Seq(
      JaEntry("一", 0, 0, 2000), JaEntry("二", 0, 0, 2000),
      JaEntry("三", 0, 0, 2000),
      JaEntry("一二", 0, 0, 3500), JaEntry("一二三", 0, 0, 2000))
    val ts = new Kuromoji(d, mode = Search).tokenize("一二三")
    // tri 2000+3000=5000 still beats [一二][三]=5500 and unigrams 6000;
    // threshold 5000+3000=8000 >= 5500 -> both emitted
    assert(ts.map(t => (t.term, t.posIncr, t.posLength)).toSeq === Seq(
      ("一二", 1, 1), ("一二三", 0, 2), ("三", 1, 1)))
    // absolute positions: compound shares the first sub-token's position
    val an = new Kuromoji(d, mode = Search).analyze("一二三")
    assert(an.map(t => (t.term, t.position)).toSeq === Seq(
      ("一二", 0), ("一二三", 0), ("三", 1)))
  }

  test("SEARCH compound alone when the 2nd best exceeds bestCost+penalty") {
    val d = Seq(
      JaEntry("一", 0, 0, 9000), JaEntry("二", 0, 0, 9000),
      JaEntry("三", 0, 0, 9000),
      JaEntry("一二", 0, 0, 9000), JaEntry("一二三", 0, 0, 2000))
    // tri 5000; alt best [一二][三] = 18000 > 8000 -> compound only
    assert(new Kuromoji(d, mode = Search).tokenize("一二三")
      .map(t => (t.term, t.posLength)).toSeq === Seq(("一二三", 1)))
  }

  test("unknown words: group classes span the run, non-group go per char") {
    val tok = new Kuromoji(dict)
    // KATAKANA group=true: one UNKNOWN token for the whole run
    val kat = tok.tokenize("アイウ")
    assert(kat.map(t => (t.term, t.known)).toSeq === Seq(("アイウ", false)))
    // ALPHA group=true
    assert(tok.tokenize("abc").map(_.term).toSeq === Seq("abc"))
    // KANJI group=false: per-char unknowns
    assert(tok.tokenize("臨臨").map(_.term).toSeq === Seq("臨", "臨"))
    // mixed: known digits around an unknown run
    assert(tok.tokenize("一二アイ三").map(_.term).toSeq ===
      Seq("一二", "アイ", "三"))
  }

  test("EXTENDED: unknown words unigram; punctuation discarded") {
    val ext = new Kuromoji(dict, mode = Extended)
    assert(ext.tokenize("アイウ").map(_.term).toSeq === Seq("ア", "イ", "ウ"))
    // discardPunctuation (default): the ideographic comma vanishes
    assert(new Kuromoji(dict).tokenize("一、二").map(_.term).toSeq ===
      Seq("一", "二"))
    assert(new Kuromoji(dict, discardPunctuation = false)
      .tokenize("一、二").map(_.term).toSeq === Seq("一", "、", "二"))
  }

  test("user dictionary: custom segmentation wins at WORD_COST -100000 " +
       "and emits per-segment tokens (Dict/UserDictionary.cs)") {
    import JapaneseExtras._
    // without the user entry, the lexicon segments 一二三 as the trigram
    val user = Seq(JaUserEntry("一二三", Seq("一二", "三"),
      readings = Seq("イチニ", "サン"), pos = "カスタム名詞"))
    val tok = new Kuromoji(dict, userDict = user)
    val ts = tok.tokenize("九一二三九")
    assert(ts.map(t => (t.term, t.startOff, t.endOff, t.partOfSpeech)).toSeq ===
      Seq(("九", 0, 1, ""), ("一二", 1, 3, "カスタム名詞"),
          ("三", 3, 4, "カスタム名詞"), ("九", 4, 5, "")))
    // per-segment readings flow to the reading-form filter
    assert(readingForm(ts).map(_.term).toSeq ===
      Seq("九", "イチニ", "サン", "九"))
    // SEARCH mode never compound-expands a user match (:928 backType != USER)
    assert(new Kuromoji(dict, mode = Search, userDict = user)
      .tokenize("一二三").map(t => (t.term, t.posIncr)).toSeq ===
      Seq(("一二", 1), ("三", 1)))
    // malformed segmentation rejected
    intercept[IllegalArgumentException](JaUserEntry("一二", Seq("一", "三")))
  }

  test("toDot: lattice as DOT with the best path highlighted") {
    val dot = new Kuromoji(dict).toDot("一二三")
    assert(dot.startsWith("digraph viterbi {"))
    assert(dot.contains("init -> 0 [label=\"BOS\"]"))
    assert(dot.contains("3 -> fini [label=\"EOS\"]"))
    // the winning trigram edge is highlighted; the losing bigram is not
    assert(dot.contains("0 -> 3 [label=\"一二三 2000\" color=\"#40e050\""))
    assert(dot.contains("0 -> 2 [label=\"一二 1500\"]"))
    // SEARCH mode shows the penalty in the label
    val sdot = new Kuromoji(dict, mode = Search).toDot("一二三")
    assert(sdot.contains("label=\"一二三 2000+3000\""))
  }

  test("filters: baseForm / posStop / katakanaStem") {
    import JapaneseFilters._
    val ts = Array(
      JaToken("走っ", 0, 2, 1, 1, known = true, "動詞", baseForm = "走る"),
      JaToken("の", 2, 3, 1, 1, known = true, "助詞"),
      JaToken("コンピューター", 3, 10, 1, 1, known = true, "名詞"))
    assert(baseForm(ts).map(_.term).toSeq ===
      Seq("走る", "の", "コンピューター"))
    // posStop drops the particle; its increment accumulates
    val stopped = posStop(ts, Set("助詞"))
    assert(stopped.map(t => (t.term, t.posIncr)).toSeq ===
      Seq(("走っ", 1), ("コンピューター", 2)))
    // katakana stem: trailing U+30FC stripped at length >= 4
    assert(katakanaStem(ts).map(_.term).toSeq ===
      Seq("走っ", "の", "コンピュータ"))
    assert(katakanaStem(Array(JaToken("サー", 0, 2, 1, 1, known = false)))
      .head.term === "サー") // too short
  }
}
