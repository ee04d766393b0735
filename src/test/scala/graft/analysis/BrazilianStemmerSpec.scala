package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** The reference's complete TestBrazilianStemmer vector set (86 cases)
  * through the filter surface (null/unchanged keeps the original). */
class BrazilianStemmerSpec extends AnyFunSuite {

  test("all reference vectors") {
    val vectors = Seq(
      "boa" -> "boa",
      "boainain" -> "boainain",
      "boas" -> "boas",
      "bôas" -> "boas",
      "boassu" -> "boassu",
      "boataria" -> "boat",
      "boate" -> "boat",
      "boates" -> "boat",
      "boatos" -> "boat",
      "bob" -> "bob",
      "boba" -> "bob",
      "bobagem" -> "bobag",
      "bobagens" -> "bobagens",
      "bobalhões" -> "bobalho",
      "bobear" -> "bob",
      "bobeira" -> "bobeir",
      "bobinho" -> "bobinh",
      "bobinhos" -> "bobinh",
      "bobo" -> "bob",
      "bobs" -> "bobs",
      "boca" -> "boc",
      "bocadas" -> "boc",
      "bocadinho" -> "bocadinh",
      "bocado" -> "boc",
      "bocaiúva" -> "bocaiuv",
      "boçal" -> "bocal",
      "bocarra" -> "bocarr",
      "bocas" -> "boc",
      "bode" -> "bod",
      "bodoque" -> "bodoqu",
      "body" -> "body",
      "boeing" -> "boeing",
      "boem" -> "boem",
      "boemia" -> "boem",
      "boêmio" -> "boemi",
      "bogotá" -> "bogot",
      "boi" -> "boi",
      "bóia" -> "boi",
      "boiando" -> "boi",
      "quiabo" -> "quiab",
      "quicaram" -> "quic",
      "quickly" -> "quickly",
      "quieto" -> "quiet",
      "quietos" -> "quiet",
      "quilate" -> "quilat",
      "quilates" -> "quilat",
      "quilinhos" -> "quilinh",
      "quilo" -> "quil",
      "quilombo" -> "quilomb",
      "quilométricas" -> "quilometr",
      "quilométricos" -> "quilometr",
      "quilômetro" -> "quilometr",
      "quilômetros" -> "quilometr",
      "quilos" -> "quil",
      "quimica" -> "quimic",
      "quilos" -> "quil",
      "quimica" -> "quimic",
      "quimicas" -> "quimic",
      "quimico" -> "quimic",
      "quimicos" -> "quimic",
      "quimioterapia" -> "quimioterap",
      "quimioterápicos" -> "quimioterap",
      "quimono" -> "quimon",
      "quincas" -> "quinc",
      "quinhão" -> "quinha",
      "quinhentos" -> "quinhent",
      "quinn" -> "quinn",
      "quino" -> "quin",
      "quinta" -> "quint",
      "quintal" -> "quintal",
      "quintana" -> "quintan",
      "quintanilha" -> "quintanilh",
      "quintão" -> "quinta",
      "quintessência" -> "quintessente",
      "quintino" -> "quintin",
      "quinto" -> "quint",
      "quintos" -> "quint",
      "quintuplicou" -> "quintuplic",
      "quinze" -> "quinz",
      "quinzena" -> "quinzen",
      "quiosque" -> "quiosqu",
      "Brasil" -> "brasil",
      "Brasília" -> "brasil",
      "quimio5terápicos" -> "quimio5terapicos",
      "áá" -> "áá",
      "ááá" -> "aaa")
    vectors.foreach { case (in, out) =>
      assert(BrazilianStemmer.stemToken(in) == out, s"stem($in)")
    }
  }

  test("quirks preserved: logias reports altered without changing, ira removes ava") {
    // R2 of futurologias is "ologias" so the 'logias' rule fires — but the
    // reference discards the ReplaceSuffix result: altered=true, term
    // unchanged (without the quirk this would stem to futurolog)
    assert(BrazilianStemmer.stem("futurologias") == "futurologias")
    // ordinary 'ias' words still reduce through step 2
    assert(BrazilianStemmer.stem("analogias") == "analog")
    // RV of partira is "tira": step 2's (ira → remove "ava") no-op marks
    // altered, skipping step 4 — the -ira form survives (vs "part")
    assert(BrazilianStemmer.stem("partira") == "partira")
  }

  test("filter surface: non-indexable and non-letter terms") {
    assert(BrazilianStemmer.stem("ab") == null)      // too short
    assert(BrazilianStemmer.stemToken("ab") == "ab") // filter keeps original
    assert(BrazilianStemmer.stem("a" * 30) == null)  // too long
    assert(BrazilianStemmer.stem("b2b2b") == "b2b2b") // non-letter → CT as-is
  }
}
