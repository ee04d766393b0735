package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Dictionary-builder parsing: CSVUtil quote semantics, IPADIC/UniDic
  * column mapping, matrix.def, user-dict CSV — then an end-to-end
  * build-from-CSV segmentation through the Kuromoji lattice. */
class KuromojiDictSpec extends AnyFunSuite {
  import KuromojiDict._

  test("csvParse — CSVUtil semantics") {
    assert(csvParse("a,b,c").toSeq == Seq("a", "b", "c"))
    assert(csvParse("\"a,b\",c").toSeq == Seq("a,b", "c"))
    assert(csvParse("\"a\"\"b\",c").toSeq == Seq("a\"b", "c"))
    assert(csvParse("\"unbalanced,c").isEmpty) // odd quote count → nothing
    assert(csvParse("a,,c").toSeq == Seq("a", "", "c"))
  }

  test("ipadic line mapping") {
    val e = parseIpadicLine(
      "東京,1285,1285,5000,名詞,固有名詞,地域,一般,*,*,東京,トウキョウ,トーキョー").get
    assert(e.surface == "東京" && e.leftId == 1285 && e.cost == 5000)
    assert(e.partOfSpeech == "名詞-固有名詞-地域-一般")
    assert(e.baseForm == "") // baseForm == surface → stored empty
    assert(e.reading == "トウキョウ")
    assert(parseIpadicLine("too,1,2,3,few").isEmpty)
  }

  test("normalizeEntries adds the NFKC twin") {
    // fullwidth Ｔ normalizes to T
    val lines = Seq("Ｔｖ,1,1,100,名詞,*,*,*,*,*,*,*,*")
    val es = parseMecab(lines, normalizeEntries = true)
    assert(es.map(_.surface) == Seq("Ｔｖ", "Tv"))
    assert(parseMecab(lines).map(_.surface) == Seq("Ｔｖ"))
  }

  test("matrix.def and user dictionary") {
    val m = parseMatrixDef("2 2\n0 0 10\n0 1 -5\n1 0 3\n1 1 0\n")
    assert(m((0, 1)) == -5 && m((1, 0)) == 3)

    val u = parseUserDict(Seq(
      "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,カスタム名詞 # airport",
      "# full comment line"))
    assert(u.length == 1)
    assert(u.head.segments == Seq("関西", "国際", "空港"))
    assert(u.head.readings == Seq("カンサイ", "コクサイ", "クウコウ"))
    assert(u.head.pos == "カスタム名詞")
    assertThrows[IllegalArgumentException](parseUserDict(Seq("a,a b,ア,名詞")))
  }

  test("end-to-end: lexicon built from CSV segments through the lattice") {
    val csv = Seq(
      "外国,1,1,2000,名詞,一般,*,*,*,*,外国,ガイコク,ガイコク",
      "人,1,1,1000,名詞,接尾,*,*,*,*,人,ジン,ジン",
      "参政,1,1,2000,名詞,サ変接続,*,*,*,*,参政,サンセイ,サンセイ",
      "権,1,1,1000,名詞,接尾,*,*,*,*,権,ケン,ケン",
      "外国人,1,1,2500,名詞,一般,*,*,*,*,外国人,ガイコクジン,ガイコクジン")
    val entries = parseMecab(csv)
    val k = new Kuromoji(entries, parseMatrixDef("1 1\n1 1 0\n"))
    val toks = k.tokenize("外国人参政権").map(_.term).toSeq
    // 外国人 (2500) beats 外国+人 (3000); 参政+権 the only cover for the rest
    assert(toks == Seq("外国人", "参政", "権"))
  }
}
