package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Vectors for the reference-parity light/minimal pack. The en/fr/pt/de-min/
  * gl vectors are the reference's own single-term test cases
  * (Lucene.Net.Tests.Analysis.Common/Analysis/{En,Fr,Pt,De,Gl}/Test*StemFilter.cs);
  * the rest are hand-traced through the published rule sets transcribed in
  * [[LightStemmers3]], exercising every tier.
  */
class LightStemmers3Spec extends AnyFunSuite {
  import LightStemmers3._

  private def check(f: String => String)(pairs: (String, String)*): Unit =
    pairs.foreach { case (in, out) => assert(f(in) == out, s"stem($in)") }

  test("english minimal (Harman S-stemmer) — reference vectors") {
    check(englishMinimal)(
      "queries" -> "query", "phrases" -> "phrase", "corpus" -> "corpus",
      "stress" -> "stress", "kings" -> "king", "panels" -> "panel",
      "aerodynamics" -> "aerodynamic", "congress" -> "congress",
      "serious" -> "serious", "ties" -> "ty", "as" -> "as", "s" -> "s")
  }

  test("french light — reference vectors") {
    check(frenchLight)(
      "chevaux" -> "cheval", "cheval" -> "cheval", "hiboux" -> "hibou",
      "chantés" -> "chant", "chanter" -> "chant", "chante" -> "chant",
      "baronnes" -> "baron", "barons" -> "baron", "baron" -> "baron",
      "peaux" -> "peau", "anneaux" -> "aneau", "neveux" -> "neveu",
      "affreux" -> "afreu", "affreuse" -> "afreu",
      "investissement" -> "investi", "investir" -> "investi",
      "assourdissant" -> "asourdi", "assourdir" -> "asourdi",
      "pratiquement" -> "pratiqu", "pratique" -> "pratiqu",
      "administrativement" -> "administratif", "administratif" -> "administratif",
      "justificatrice" -> "justifi", "justificateur" -> "justifi",
      "justifier" -> "justifi", "educatrice" -> "eduqu", "eduquer" -> "eduqu",
      "communicateur" -> "comuniqu", "communiquer" -> "comuniqu",
      "accompagnatrice" -> "acompagn", "accompagnateur" -> "acompagn",
      "administrateur" -> "administr", "administrer" -> "administr",
      "productrice" -> "product", "producteur" -> "product",
      "acheteuse" -> "achet", "acheteur" -> "achet",
      "planteur" -> "plant", "plante" -> "plant",
      "poreuse" -> "poreu", "poreux" -> "poreu", "plieuse" -> "plieu",
      "bijoutière" -> "bijouti", "bijoutier" -> "bijouti",
      "caissière" -> "caisi", "caissier" -> "caisi",
      "abrasive" -> "abrasif", "abrasif" -> "abrasif",
      "folle" -> "fou", "fou" -> "fou",
      "personnelle" -> "person", "personne" -> "person",
      "complète" -> "complet", "complet" -> "complet")
  }

  test("french minimal — reference vectors") {
    check(frenchMinimal)(
      "chevaux" -> "cheval", "hiboux" -> "hibou", "chantés" -> "chant",
      "chanter" -> "chant", "chante" -> "chant", "baronnes" -> "baron",
      "barons" -> "baron", "baron" -> "baron", "chat" -> "chat")
  }

  test("german light — each cascade tier") {
    check(germanLight)(
      // -ern, -e(m|n|r|s), bare -e, -s after stEnding; then step2
      "kindern" -> "kind", "häuser" -> "haus", "bücher" -> "buch",
      "größe" -> "groß", "buchs" -> "buch",
      // step2 after step1: "kleinest" -> step1 no, step2 -est
      "kleinest" -> "klein")
  }

  test("german minimal — reference vectors") {
    check(germanMinimal)(
      "sängerinnen" -> "sangerin", "frauen" -> "frau",
      "kenntnisse" -> "kenntnis", "staates" -> "staat", "bilder" -> "bild",
      "boote" -> "boot", "götter" -> "gott", "äpfel" -> "apfel",
      "haus" -> "haus")
  }

  test("spanish light") {
    check(spanishLight)(
      "sombreros" -> "sombrer", "luces" -> "luz", "intereses" -> "interes",
      "corazón" -> "corazon", "niñas" -> "niñ", "casa" -> "casa", // len < 5 untouched
      "gato" -> "gato")
  }

  test("italian light") {
    check(italianLight)(
      "ragazzo" -> "ragazz", "ragazzi" -> "ragazz", "ragazza" -> "ragazz",
      "ragazze" -> "ragazz", "amiche" -> "amic", "amici" -> "amici", // len < 6 untouched
      "zii" -> "zii",
      "società" -> "societ")
  }

  test("finnish light") {
    check(finnishLight)(
      "kirjat" -> "kirj", "kirjassa" -> "kirj", "kaupunkien" -> "kaupunk",
      "edeltäjistään" -> "edeltajist", "tyhjääkin" -> "tyh",
      "lakkautettu" -> "lakautet")
  }

  test("hungarian light") {
    check(hungarianLight)(
      "házak" -> "haz", "gyerekeknek" -> "gyerek", "babakocsi" -> "babakocs",
      "apám" -> "apa", "lába" -> "lab")
  }

  test("norwegian light — bokmål default, nynorsk flag") {
    check(norwegianLight(_))(
      "hemmeligheten" -> "hemmelig", "hemmelighet" -> "hemmelig",
      "følelsen" -> "føl", "husene" -> "hus", "kristendom" -> "kristen",
      "finest" -> "fin", "kake" -> "kak")
    assert(norwegianLight("gutane", bokmaal = false, nynorsk = true) == "gut")
    assert(norwegianLight("hemmelegheita", bokmaal = false, nynorsk = true) == "hemmeleg")
    // bokmål alone leaves the nynorsk ending to the weaker tiers
    assert(norwegianLight("gutane") == "gutan")
    assertThrows[IllegalArgumentException](
      norwegianLight("x", bokmaal = false, nynorsk = false))
  }

  test("norwegian minimal") {
    check(norwegianMinimal(_))(
      "husene" -> "hus", "gutter" -> "gutt", "kaker" -> "kak",
      "jenta" -> "jent", "bilen" -> "bil")
    assert(norwegianMinimal("gutane", bokmaal = false, nynorsk = true) == "gut")
  }

  test("swedish light") {
    check(swedishLight)(
      "jaktkarlens" -> "jaktkarl", "händelser" -> "händ",
      "flickorna" -> "flick", "starkaste" -> "stark", "starkast" -> "stark",
      "starkare" -> "stark", "huset" -> "hus", "katten" -> "katt",
      "katt" -> "kat")
  }

  test("russian light") {
    check(russianLight)(
      "энергии" -> "энерг", "книга" -> "книг", "книгами" -> "книг",
      "большой" -> "больш", "наконец" -> "наконец")
  }

  test("portuguese light — reference vectors") {
    check(portugueseLight)(
      "doutores" -> "doutor", "doutor" -> "doutor", "homens" -> "homem",
      "homem" -> "homem", "papéis" -> "papel", "papel" -> "papel",
      "normais" -> "normal", "normal" -> "normal", "lencóis" -> "lencol",
      "lencol" -> "lencol", "barris" -> "barril", "barril" -> "barril",
      "botões" -> "bota", "botão" -> "bota",
      "rapidamente" -> "rapid", "bonita" -> "bonit", "bonito" -> "bonit")
  }

  test("portuguese minimal — RSLP plural step") {
    check(portugueseMinimal)(
      "casas" -> "casa", "bons" -> "bom", "balões" -> "balão",
      "normais" -> "normal", "papéis" -> "papel", "barris" -> "barril",
      "flores" -> "flor",
      // "ães" excepted for mães, but the final "s" rule still fires —
      // the reference's Apply tries LATER rules after an exception
      "mães" -> "mãe",
      "lápis" -> "lápis", "males" -> "male", // pt "les" rule needs stem>=3
      "mar" -> "mar") // no trailing s → condition fails
  }

  test("galician minimal — RSLP plural step (reference vectors)") {
    check(galicianMinimal)(
      "elefantes" -> "elefante", "elefante" -> "elefante",
      "kalóres" -> "kalór", "kalór" -> "kalór",
      "mas" -> "mas", "barcelonês" -> "barcelonês",
      "luces" -> "luz", "animás" -> "animal", "caracois" -> "caracol")
  }

  test("registry exposes every stemmer") {
    assert(byName.size == 16)
    assert(byName("en_minimal")("kings") == "king")
    assert(byName("no_light")("husene") == "hus")
  }

  test("referenceStemmingForLang wires the reference-default light chain") {
    val fr = Analyzer.referenceStemmingForLang("fr")
    assert(fr.analyze("les chevaux").tokens.map(_.term).toSeq == Seq("cheval"))
    // German chain: GermanNormalization (ae→a tier) THEN GermanLight
    val de = Analyzer.referenceStemmingForLang("de")
    assert(de.analyze("häuser").tokens.map(_.term).toSeq == Seq("haus"))
    // non-light languages fall back to the default registry (Snowball sv)
    val sv = Analyzer.referenceStemmingForLang("sv")
    assert(sv.analyze("bilarna").tokens.map(_.term).nonEmpty)
  }
}
