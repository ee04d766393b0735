package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Phonetic encoders (reference surface: Lucene.Net.Analysis.Phonetic/
  * Language/{Soundex,Nysiis,RefinedSoundex,ColognePhonetic}.cs), each
  * implemented from its public algorithm spec and validated on the
  * algorithms' own canonical examples plus sound-alike collision pairs. */
class PhoneticSpec extends AnyFunSuite {

  test("American Soundex NARA examples") {
    assert(Phonetic.soundex("Robert") === "R163")
    assert(Phonetic.soundex("Rupert") === "R163")
    assert(Phonetic.soundex("Ashcraft") === "A261") // h/w transparent
    assert(Phonetic.soundex("Tymczak") === "T522")
    assert(Phonetic.soundex("Pfister") === "P236")
    // non-letters strip before encoding (SoundexUtils.Clean): they do
    // not reset duplicate suppression like a vowel would
    assert(Phonetic.soundex("b2b") === "B000")
    assert(Phonetic.soundex("O'Brien") === Phonetic.soundex("OBrien"))
  }

  test("NYSIIS: canonical traces and sound-alike collisions") {
    // STEVENS/STEPHENS is the algorithm's motivating pair (EV→AF, PH→FF)
    assert(Phonetic.nysiis("STEVENS") === "STAFAN")
    assert(Phonetic.nysiis("STEPHENS") === "STAFAN")
    assert(Phonetic.nysiis("JOHN") === "JAN")
    assert(Phonetic.nysiis("JON") === "JAN")
    assert(Phonetic.nysiis("KNIGHT") === Phonetic.nysiis("NIGHT"))
    assert(Phonetic.nysiis("SCHMIDT") === Phonetic.nysiis("SCHMID")) // DT tail → D
    // head/tail transcodes fire
    assert(Phonetic.nysiis("MACINTOSH").startsWith("MC"))
    assert(!Phonetic.nysiis("BRANDT").endsWith("T")) // NDT tail → D
    // distinct-sounding names do NOT collide
    assert(Phonetic.nysiis("WASHINGTON") !== Phonetic.nysiis("JEFFERSON"))
    // end-of-word is a NON-vowel for the H rule (reference feeds SPACE
    // as next): trailing vowel+H transcodes, so SARAH ≡ SARA
    assert(Phonetic.nysiis("SARAH") === "SAR")
    assert(Phonetic.nysiis("SARAH") === Phonetic.nysiis("SARA"))
  }

  test("Refined Soundex: published example + finer classes separate Soundex collisions") {
    assert(Phonetic.refinedSoundex("testing") === "T6036084")
    assert(Phonetic.refinedSoundex("TESTING") === "T6036084")
    // classic Soundex merges d/t with no vowel codes; refined keeps vowels as 0
    assert(Phonetic.refinedSoundex("dogs") === "D6043")
    // b and f collide in Soundex class 1 but split here (1 vs 2)
    assert(Phonetic.refinedSoundex("bat").charAt(1) !== Phonetic.refinedSoundex("fat").charAt(1))
  }

  test("Cologne phonetic: published vectors") {
    assert(Phonetic.cologne("Wikipedia") === "3412")
    assert(Phonetic.cologne("Breschnew") === "17863")
    assert(Phonetic.cologne("Müller-Lüdenscheidt") === "65752682")
    // sound-alike German pairs collide
    assert(Phonetic.cologne("Meyer") === Phonetic.cologne("Maier"))
    assert(Phonetic.cologne("Schmidt") === Phonetic.cologne("Schmitt"))
    // silent H (and any non-letter) BREAKS duplicate suppression
    // (ColognePhonetic.cs:359-366): equal codes across it both emit
    assert(Phonetic.cologne("hochkant") === "04462")
    assert(Phonetic.cologne("bhb") === "11")
    assert(Phonetic.cologne("bb") === "1")
  }

  test("Metaphone: published single-word vectors (rule-by-rule coverage)") {
    val vectors = Seq(
      "howl" -> "HL", "testing" -> "TSTN", "The" -> "0", "quick" -> "KK",
      "brown" -> "BRN", "fox" -> "FKS", "jumped" -> "JMPT", "over" -> "OFR",
      "lazy" -> "LS", "dogs" -> "TKS",
      // MB terminal: B silent
      "COMB" -> "KM", "TOMB" -> "TM", "WOMB" -> "WM",
      // SCI/SCE/SCY: C silent after S before front vowel
      "SCIENCE" -> "SNS", "SCENE" -> "SN", "SCY" -> "S",
      // WH -> W, then W before consonant silent, terminal Y silent
      "WHY" -> "",
      // CIA -> X; SCH -> SK; initial CH + vowel at 2 -> K; CH -> X
      "CIAPO" -> "XP", "SCHEDULE" -> "SKTL", "SCHEMATIC" -> "SKMT",
      "CHARACTER" -> "KRKT", "TEACH" -> "TX",
      // DGE/DGY -> J; GH silent; GN/GNED silent
      "DODGY" -> "TJ", "DODGE" -> "TJ", "ADGIEMTI" -> "AJMT",
      "GHENT" -> "KNT", "BAUGH" -> "B", "GNU" -> "N", "SIGNED" -> "SNT",
      // PH -> F + SH -> X; SIO/SIA/TIO/TIA -> X; TCH: T silent
      "PHISH" -> "FX", "SHOT" -> "XT", "ODSIAN" -> "OTXN",
      "PULSION" -> "PLXN", "OTIA" -> "OX", "PORTION" -> "PRXN",
      "RETCH" -> "RX", "WATCH" -> "WX",
      // X -> KS with truncation at the code length
      "AXEAXE" -> "AKSK")
    vectors.foreach { case (in, want) =>
      assert(Phonetic.metaphone(in) === want, s"metaphone($in)")
    }
    assert(Phonetic.metaphone("AXEAXEAXE", maxLen = 6) === "AKSKSK")
  }

  test("Metaphone: sound-alike name groups collide") {
    def eq(a: String, b: String) = Phonetic.metaphone(a) === Phonetic.metaphone(b)
    for (m <- Seq("Ailbert", "Alberik", "Alberto", "Albrecht"))
      assert(eq("Albert", m), s"Albert ~ $m")
    for (m <- Seq("Pearcy", "Perris", "Piercy", "Pierz", "Pryse"))
      assert(eq("Paris", m), s"Paris ~ $m")
    for (m <- Seq("Rey", "Roi", "Roy", "Ruy")) assert(eq("Ray", m), s"Ray ~ $m")
    for (m <- Seq("Rota", "Rudd", "Ryde")) assert(eq("Wright", m), s"Wright ~ $m")
    assert(eq("Lawrence", "Lorenza"))
    assert(eq("Aero", "Eure"))
  }

  test("Caverphone 2.0: published examples and encoding groups") {
    assert(Phonetic.caverphone2("Stevenson") === "STFNSN1111")
    assert(Phonetic.caverphone2("Peter") === "PTA1111111")
    assert(Phonetic.caverphone2("Peter") === Phonetic.caverphone2("Peady"))
    assert(Phonetic.caverphone2("social") === "SSA1111111")
    // whole published variation groups map to one code
    val groups = Seq(
      "AT11111111" -> Seq("add", "aid", "at", "art", "eat", "earth", "head",
        "hit", "hot", "hold", "hard", "heart", "it", "out", "old"),
      "TN11111111" -> Seq("Dan", "Dane", "Dawn", "Dean", "Deanne", "Diane",
        "Doane", "Down", "Duane", "Dunn", "Tan", "Ten", "Terhune", "Thain",
        "Thanh", "Thorne", "Tien", "Tjon", "Towne", "Tyne"),
      "TTA1111111" -> Seq("Darda", "Datha", "Deirdre", "Detta", "Dorthy",
        "Doughty", "Dowdell", "Duthie", "Tada", "Teador", "Teddy", "Theda",
        "Theodore", "Theta", "Tudor", "Turtle", "Tuttle"),
      "KLN1111111" -> Seq("Cailean", "Callahan", "Carlene", "Charlene",
        "Cherlyn", "Clein", "Cline", "Colleen", "Cullen", "Gaelan", "Galen",
        "Gillian", "Glen", "Glynn", "Karlen", "Kellyann", "Khalin", "Killian",
        "Klein", "Kline", "Koerlin", "Kylynn", "Quillan", "Xylon"),
      "RTA1111111" -> Seq("rather", "ready", "writer"),
      "APA1111111" -> Seq("able", "appear"))
    for ((code, words) <- groups; word <- words)
      assert(Phonetic.caverphone2(word) === code, s"caverphone2($word)")
    // the -ough head rule replaces the WHOLE gh (rough → rou2f), so
    // rough collides with ruff — the g must not survive as K
    assert(Phonetic.caverphone2("rough") === "RF11111111")
    assert(Phonetic.caverphone2("rough") === Phonetic.caverphone2("ruff"))
    assert(Phonetic.caverphone2("enough") === "ANF1111111")
  }

  test("Caverphone 1.0: published examples (6-char codes, 1.0-only rules)") {
    val vectors = Seq("mb" -> "M11111", "mbmb" -> "MPM111", "David" -> "TFT111",
      "Whittle" -> "WTL111", "Lee" -> "L11111", "Thompson" -> "TMPSN1")
    vectors.foreach { case (in, want) =>
      assert(Phonetic.caverphone1(in) === want, s"caverphone1($in)")
    }
    for (w <- Seq("add", "aid", "at", "art", "eat", "earth", "head", "hit",
      "hot", "hold", "hard", "heart", "it", "out", "old"))
      assert(Phonetic.caverphone1(w) === "AT1111", s"caverphone1($w)")
    assert(Phonetic.caverphone1("rough") === "RF1111") // gh fully replaced
  }

  test("Daitch-Mokotoff: published vectors incl. branching and foldings") {
    import DaitchMokotoff.{encode, soundexes}
    // accent folding and whitespace handling
    assert(soundexes("Straßburg") === "294795")
    assert(soundexes("Strasburg") === "294795")
    assert(soundexes("Éregon") === "095600")
    assert(soundexes("Eregon") === "095600")
    assert(encode(" \t\n\r Washington \t\n\r ") === "746536")
    // adjacent-code collapse incl. the ks/s case
    assert(soundexes("AKSSOL") === "054800")
    // branching: every plausible reading, in chart order
    assert(soundexes("GERSCHFELD") === "547830|545783|594783|594578")
    assert(soundexes("AUERBACH") === "097400|097500")
    assert(soundexes("LIPPSZYC") === "874400|874500")
    assert(soundexes("Ceniow") === "467000|567000")
    assert(soundexes("Tsenyuv") === "467000")
    assert(soundexes("Holubica") === "587400|587500")
    assert(soundexes("Peters") === "734000|739400")
    assert(soundexes("Peterson") === "734600|739460")
    assert(soundexes("Jackson") === "154600|145460|454600|445460")
    assert(soundexes("Rosochowaciec") ===
      "944744|944745|944754|944755|945744|945745|945754|945755")
    assert(soundexes("ţamas") === "364000|464000") // t-cedilla
    assert(soundexes("țamas") === "364000|464000") // t-comma
    // genealogy-standard homophone pairs (non-branching encode)
    assert(encode("AUERBACH") === encode("OHRBACH"))
    assert(encode("LIPSHITZ") === encode("LIPPSZYC"))
    assert(encode("LEWINSKY") === encode("LEVINSKI"))
    assert(encode("SZLAMAWICZ") === encode("SHLAMOVITZ"))
    // the standard's worked examples
    assert(soundexes("GOLDEN") === "583600")
    assert(soundexes("Alpert") === "087930")
    assert(soundexes("Breuer") === "791900")
    assert(soundexes("Haber") === "579000")
    assert(soundexes("Mannheim") === "665600")
    assert(soundexes("Mintz") === "664000")
    assert(soundexes("Topf") === "370000")
    assert(soundexes("Kleinmann") === "586660")
    assert(soundexes("Ben Aron") === "769600")
  }

  test("Match Rating Approach: published encodings and homophony ratings") {
    assert(Phonetic.mra("HARPER") === "HRPR")
    assert(Phonetic.mra("Smith") === "SMTH")
    assert(Phonetic.mra("Smyth") === "SMYTH")
    assert(Phonetic.mra(" ") === "")
    assert(Phonetic.mra("") === "")
    assert(Phonetic.mra("E") === "")
    // pipeline pieces behave as published: vowel drop keeps a leading
    // vowel, doubles collapse, >6 chars reduce to first3+last3
    assert(Phonetic.mra("ALESSANDRA") === "ALSNDR")
    assert(Phonetic.mra("AIDAN") === "ADN")
    // de-voweled MSSSSPP collapses pairwise (PP then SS, one pass each)
    assert(Phonetic.mra("MISSISSIPPI") === "MSSP")
    // homophony
    assert(Phonetic.mraMatches("smith", "smyth"))
    assert(Phonetic.mraMatches("Burns", "Bourne"))
    assert(Phonetic.mraMatches("John", "John"))
    assert(!Phonetic.mraMatches("Al", "Ed"))
    assert(!Phonetic.mraMatches("test", ""))
    assert(!Phonetic.mraMatches("", "test"))
    assert(!Phonetic.mraMatches("t", "test"))
    assert(!Phonetic.mraMatches("test", " "))
  }
}
