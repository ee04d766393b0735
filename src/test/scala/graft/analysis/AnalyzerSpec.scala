package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Golden tokenization vectors lifted from the reference's
  * TestStandardAnalyzer (reference: /root/reference/src/
  * Lucene.Net.Tests.Analysis.Common/Analysis/Core/TestStandardAnalyzer.cs).
  * The rebuilt analyzer must match exactly. */
class AnalyzerSpec extends AnyFunSuite {

  private def toks(s: String): Seq[String] =
    UAX29Tokenizer.tokenize(s).map(_.term).toSeq

  test("alphanumerics (B2B, 2B)") {
    assert(toks("B2B") == Seq("B2B"))
    assert(toks("2B") == Seq("2B"))
  }

  test("delimiters - / ,") {
    assert(toks("some-dashed-phrase") == Seq("some", "dashed", "phrase"))
    assert(toks("dogs,chase,cats") == Seq("dogs", "chase", "cats"))
    assert(toks("ac/dc") == Seq("ac", "dc"))
  }

  test("internal apostrophes") {
    assert(toks("O'Reilly") == Seq("O'Reilly"))
    assert(toks("you're") == Seq("you're"))
    assert(toks("she's") == Seq("she's"))
    assert(toks("Jim's") == Seq("Jim's"))
    assert(toks("don't") == Seq("don't"))
    assert(toks("O'Reilly's") == Seq("O'Reilly's"))
  }

  test("numerics, serials, IPs") {
    assert(toks("21.35") == Seq("21.35"))
    assert(toks("R2D2 C3PO") == Seq("R2D2", "C3PO"))
    assert(toks("216.239.63.104") == Seq("216.239.63.104"))
  }

  test("text with numbers, offsets, types") {
    val ts = UAX29Tokenizer.tokenize("David has 5000 bones")
    assert(ts.map(_.term).toSeq == Seq("David", "has", "5000", "bones"))
    assert(ts.map(_.startOff).toSeq == Seq(0, 6, 10, 15))
    assert(ts.map(_.endOff).toSeq == Seq(5, 9, 14, 20))
    assert(ts.map(_.tpe).toSeq == Seq("<ALPHANUM>", "<ALPHANUM>", "<NUM>", "<ALPHANUM>"))
  }

  test("various text") {
    assert(toks("C embedded developers wanted") == Seq("C", "embedded", "developers", "wanted"))
    assert(toks("foo bar FOO BAR") == Seq("foo", "bar", "FOO", "BAR"))
    assert(toks("foo      bar .  FOO <> BAR") == Seq("foo", "bar", "FOO", "BAR"))
    assert(toks("\"QUOTED\" word") == Seq("QUOTED", "word"))
  }

  test("empty / punctuation-only") {
    assert(toks("") == Seq.empty)
    assert(toks(".") == Seq.empty)
    assert(toks(" ") == Seq.empty)
  }

  test("mid-letter / mid-num / mid-numlet splits (TestMid)") {
    assert(toks("A:B") == Seq("A:B"))
    assert(toks("A::B") == Seq("A", "B"))
    assert(toks("1.2") == Seq("1.2"))
    assert(toks("A.B") == Seq("A.B"))
    assert(toks("1..2") == Seq("1", "2"))
    assert(toks("A..B") == Seq("A", "B"))
    assert(toks("1,2") == Seq("1,2"))
    assert(toks("1,,2") == Seq("1", "2"))
    assert(toks("A.:B") == Seq("A", "B"))
    assert(toks("A:.B") == Seq("A", "B"))
    assert(toks("1,.2") == Seq("1", "2"))
    assert(toks("1.,2") == Seq("1", "2"))
    assert(toks("A:B_A:B") == Seq("A:B_A:B"))
    assert(toks("A:B_A::B") == Seq("A:B_A", "B"))
    assert(toks("1.2_1.2") == Seq("1.2_1.2"))
    assert(toks("A.B_A.B") == Seq("A.B_A.B"))
    assert(toks("1.2_1..2") == Seq("1.2_1", "2"))
    assert(toks("A.B_A..B") == Seq("A.B_A", "B"))
    assert(toks("1,2_1,2") == Seq("1,2_1,2"))
    assert(toks("1,2_1,,2") == Seq("1,2_1", "2"))
    assert(toks("C_A.:B") == Seq("C_A", "B"))
    assert(toks("C_A:.B") == Seq("C_A", "B"))
    assert(toks("3_1,.2") == Seq("3_1", "2"))
    assert(toks("3_1.,2") == Seq("3_1", "2"))
  }

  test("CJK: ideographs single, fullwidth runs, hiragana/katakana/hangul") {
    assert(toks("我是中国人。 １２３４ Ｔｅｓｔｓ ") ==
      Seq("我", "是", "中", "国", "人", "１２３４", "Ｔｅｓｔｓ"))
    val jp = UAX29Tokenizer.tokenize("仮名遣い カタカナ")
    assert(jp.map(_.term).toSeq == Seq("仮", "名", "遣", "い", "カタカナ"))
    assert(jp.map(_.tpe).toSeq == Seq("<IDEOGRAPHIC>", "<IDEOGRAPHIC>",
      "<IDEOGRAPHIC>", "<HIRAGANA>", "<KATAKANA>"))
    val kr = UAX29Tokenizer.tokenize("훈민정음")
    assert(kr.map(_.term).toSeq == Seq("훈민정음"))
    assert(kr.map(_.tpe).toSeq == Seq("<HANGUL>"))
    assert(toks("안녕하세요 한글입니다") == Seq("안녕하세요", "한글입니다"))
  }

  test("supplementary ideographs") {
    val ts = UAX29Tokenizer.tokenize("𩬅艱鍟䇹愯瀛")
    assert(ts.map(_.term).toSeq == Seq("𩬅", "艱", "鍟", "䇹", "愯", "瀛"))
    assert(ts.forall(_.tpe == "<IDEOGRAPHIC>"))
  }

  test("combining marks attach (WB4)") {
    assert(toks("moͤchte") == Seq("moͤchte"))
    assert(toks("ざ") == Seq("ざ"))
    assert(toks("ザ") == Seq("ザ"))
    assert(toks("壹゙") == Seq("壹゙"))
    assert(toks("아゙") == Seq("아゙"))
  }

  test("southeast asian runs") {
    assert(toks("การที่ได้ต้องแสดงว่างานดี. แล้วเธอจะไปไหน? ๑๒๓๔") ==
      Seq("การที่ได้ต้องแสดงว่างานดี", "แล้วเธอจะไปไหน", "๑๒๓๔"))
    assert(toks("ສາທາລະນະລັດ ປະຊາທິປະໄຕ ປະຊາຊົນລາວ") ==
      Seq("ສາທາລະນະລັດ", "ປະຊາທິປະໄຕ", "ປະຊາຊົນລາວ"))
  }

  test("tibetan splits on tsheg") {
    assert(toks("སྣོན་མཛོད་དང་ལས་") == Seq("སྣོན", "མཛོད", "དང", "ལས"))
  }

  test("analyzer chain: lowercase, stops removed, positions advance over stops") {
    val a = Analyzer.standard
    val d = a.analyze("The Quick Brown FOX")
    assert(d.tokens.map(_.term).toSeq == Seq("quick", "brown", "fox"))
    // "the" occupied position 0; survivors keep their original positions
    assert(d.tokens.map(_.position).toSeq == Seq(1, 2, 3))
    assert(d.length == 3 && d.bm25DocLen == 3)
  }

  test("analyzer chain: >255-char tokens dropped but advance position") {
    val long = "x" * 300
    val a = Analyzer.noStop
    val d = a.analyze(s"alpha $long beta")
    assert(d.tokens.map(_.term).toSeq == Seq("alpha", "beta"))
    assert(d.tokens.map(_.position).toSeq == Seq(0, 2))
    assert(d.length == 2)
  }

  test("lowercase is per-codepoint (no locale 1:N mappings)") {
    assert(Analyzer.lowerCase("İstanbul").length == "İstanbul".length)
    assert(Analyzer.lowerCase("ABC") == "abc")
  }

  test("code-like content tokenizes as expected") {
    assert(toks("def f0(x0: Int) = x0 + one") ==
      Seq("def", "f0", "x0", "Int", "x0", "one"))
  }

  test("per-lang stop filtering: each language drops its own function words") {
    val es = Analyzer.forLang("es").analyze("la casa es the house")
    assert(es.tokens.map(_.term).toSeq == Seq("casa", "the", "house"))
    val de = Analyzer.forLang("de").analyze("der hund und the dog")
    assert(de.tokens.map(_.term).toSeq == Seq("hund", "the", "dog"))
    // unknown / code languages fall back to English
    val sc = Analyzer.forLang("scala").analyze("the val der")
    assert(sc.tokens.map(_.term).toSeq == Seq("val", "der"))
    // positions still advance over dropped stopwords (gap contract)
    assert(es.tokens.map(_.position).toSeq == Seq(1, 3, 4))
  }

  test("synonym injection: posIncr 0, Length/NumOverlap norm accounting") {
    val a = new Analyzer(Analyzer.EnglishStopWords,
      synonyms = Map("state" -> Seq("automaton")))
    val d = a.analyze("the state machine")
    // injected token shares the original's position (stop gap preserved)
    assert(d.tokens.map(t => (t.term, t.position)).toSeq ===
      Seq(("state", 1), ("automaton", 1), ("machine", 2)))
    // Length counts every emitted token, NumOverlap the posIncr==0 ones,
    // so the BM25 doc length ignores synonyms (reference norm contract)
    assert(d.length === 3 && d.numOverlap === 1 && d.bm25DocLen === 2)
  }

  test("accented function words are filtered (no diacritic folding happens)") {
    val es = Analyzer.forLang("es").analyze("está más casa sí perro")
    assert(es.tokens.map(_.term).toSeq == Seq("casa", "perro"))
    val de = Analyzer.forLang("de").analyze("für den Hund")
    assert(de.tokens.map(_.term).toSeq == Seq("hund"))
  }

  test("CJK bigrams: overlapping Han pairs, unigram fallback, mixed scripts") {
    val toks = CJKBigram.Tokenize("中文分词测试")
    assert(toks.map(_.term).toSeq === Seq("中文", "文分", "分词", "词测", "测试"))
    assert(toks.forall(_.tpe == CJKBigram.DOUBLE))
    // offsets span both source characters
    assert(toks.head.startOff === 0 && toks.head.endOff === 2)
    assert(toks.last.startOff === 4 && toks.last.endOff === 6)
    // lone ideograph: unigram
    val lone = CJKBigram.Tokenize("alpha 中 beta")
    assert(lone.map(_.term).toSeq === Seq("alpha", "中", "beta"))
    assert(lone(1).tpe === CJKBigram.SINGLE)
    // mixed script: each script its own way
    val mixed = CJKBigram.Tokenize("spark中文引擎fast")
    assert(mixed.map(_.term).toSeq ===
      Seq("spark", "中文", "文引", "引擎", "fast"))
    // ideographs across punctuation still bigram (reference behavior)
    val punct = CJKBigram.Tokenize("中。国")
    assert(punct.map(_.term).toSeq === Seq("中国"))
    // full chain: positions advance per emitted token, bigrams searchable
    val analyzed = Analyzer.cjk.analyze("搜索引擎 the query")
    assert(analyzed.tokens.map(_.term).toSeq === Seq("搜索", "索引", "引擎", "query"))
    assert(analyzed.tokens.map(_.position).toSeq === Seq(0, 1, 2, 4)) // 'the' gap
    assert(Analyzer.forLang("zh") eq Analyzer.cjk)
  }

  test("word delimiter: identifier sub-words (camelCase, UPPER runs, snake, digits)") {
    def split(s: String): Seq[String] =
      WordDelimiter.subWords(s).map { case (a, b) => s.substring(a, b) }
    assert(split("parseHTTPResponse") === Seq("parse", "HTTP", "Response"))
    assert(split("CamelCase") === Seq("Camel", "Case"))
    assert(split("snake_case") === Seq("snake", "case"))
    assert(split("foo2bar") === Seq("foo", "2", "bar"))
    assert(split("XMLHttpRequest2") === Seq("XML", "Http", "Request", "2"))
    assert(split("simpleword") === Seq("simpleword"))
    assert(split("UPPER") === Seq("UPPER"))
    assert(split("kebab-case") === Seq("kebab", "case"))
    // offsets are exact source slices
    val toks = WordDelimiter.Tokenize("getHTTPCode")
    assert(toks.map(_.term).toSeq === Seq("get", "HTTP", "Code"))
    assert(toks.map(t => (t.startOff, t.endOff)).toSeq ===
      Seq((0, 3), (3, 7), (7, 11)))
    // sourceCode chain: original preserved alongside parts, lowercased
    val analyzed = Analyzer.sourceCode.analyze("def parseHTTPResponse(x)")
    assert(analyzed.tokens.map(_.term).toSeq ===
      Seq("def", "parsehttpresponse", "parse", "http", "response", "x"))
  }

  test("soundex: NARA-standard golden vectors") {
    // the canonical examples from the published American Soundex standard
    val vectors = Seq(
      "Robert" -> "R163", "Rupert" -> "R163", "Rubin" -> "R150",
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // h does not separate
      "Tymczak" -> "T522",  // cz same code through adjacency
      "Pfister" -> "P236",  // pf same code, f dropped
      "Honeyman" -> "H555",
      "Washington" -> "W252", "Lee" -> "L000", "Gutierrez" -> "G362",
      "Jackson" -> "J250", "a" -> "A000")
    vectors.foreach { case (in, out) =>
      assert(Phonetic.soundex(in) === out, s"soundex($in)") }
    // sound-alike names collide through the analyzer chain
    val a = Phonetic.analyzer
    assert(a.analyzeTerms("Robert").toSeq === a.analyzeTerms("Rupert").toSeq)
  }

  test("elision: articles stripped before the stop filter (fr/ca/ga/it)") {
    // l'homme -> homme; qu'il -> il (a stop word -> dropped entirely)
    val fr = Analyzer.forLang("fr")
    assert(fr.analyzeTerms("l'homme parle").toSeq === Seq("homme", "parle"))
    assert(fr.analyzeTerms("jusqu'au matin").toSeq === Seq("matin")) // au is stopped
    // curly apostrophe too (ElisionFilter.cs accepts both)
    assert(fr.analyzeTerms("l\u2019homme").toSeq === Seq("homme"))
    // non-article prefixes keep the apostrophe form intact
    assert(fr.analyzeTerms("aujourd'hui").toSeq === Seq("aujourd'hui"))
    val ca = Analyzer.forLang("ca")
    assert(ca.analyzeTerms("l'aigua d'estiu").toSeq === Seq("aigua", "estiu"))
    val it = Analyzer.forLang("it")
    assert(it.analyzeTerms("dell'acqua").toSeq === Seq("acqua"))
    // english chain never elides
    assert(Analyzer.standard.analyzeTerms("o'brien").toSeq === Seq("o'brien"))
  }

  test("ca/eu/hy stop lists + snowball chains wire end-to-end") {
    assert(Analyzer.perLang("ca")(("aquesta")))
    assert(Analyzer.perLang("eu")(("bezala")))
    assert(Analyzer.perLang("hy")("\u0561\u0575\u0564")) // այդ
    val eu = Analyzer.snowballForLang("eu")
    assert(eu.analyzeTerms("egunkaria bezala").toSeq === Seq("egun"))
    val ca = Analyzer.snowballForLang("ca")
    assert(ca.analyzeTerms("cantava").toSeq === Seq("cant"))
  }

  test("Turkish lowercasing: dotted/dotless i rules (TurkishLowerCaseFilter)") {
    assert(TurkishLowerCase("\u0130STANBUL") === "istanbul")   // İSTANBUL
    assert(TurkishLowerCase("ISPARTA") === "\u0131sparta")      // ısparta
    assert(TurkishLowerCase("D\u0130YARBAKIR") === "diyarbak\u0131r")
    // I + combining dot above -> i, dot consumed
    assert(TurkishLowerCase("I\u0307stanbul") === "istanbul")
    // the per-language chain uses it; the generic chain must NOT
    val tr = Analyzer.forLang("tr")
    assert(tr.analyzeTerms("ISPARTA").toSeq === Seq("\u0131sparta"))
    assert(Analyzer.standard.analyzeTerms("ISPARTA").toSeq === Seq("isparta"))
  }
}
