package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import LightStemmers2._

/** Vectors hand-derived from each reference algorithm's own rules
  * (the round-3 LightStemmers discipline). */
class LightStemmers2Spec extends AnyFunSuite {

  test("bulgarian: articles, plurals, vowel trims, contractions") {
    assert(bulgarian("градът") === "град")    // definite article ът
    assert(bulgarian("книгите") === "книг")   // те article + и plural
    assert(bulgarian("игрища") === "игр")     // the ища fast path
    assert(bulgarian("хубава") === "хубав")   // final а
    assert(bulgarian("пътеци") === "пътек")   // ци -> к
    assert(bulgarian("облози") === "облог")   // зи -> г
    assert(bulgarian("театър") === "театр")   // ъN -> N
    assert(bulgarian("червен") === "червн")   // ен -> н (rule-faithful)
    assert(bulgarian("кон") === "кон")        // < 4 chars: untouched
  }

  test("czech: case endings, possessives, palatalization normalizations") {
    assert(czech("kuřatech") === "kuř")       // atech (the longest case rule)
    assert(czech("městech") === "měst")       // ech
    assert(czech("matkami") === "matk")       // ami
    assert(czech("bratrův") === "bratr")      // possessive ův
    assert(czech("pes") === "ps")             // e-deletion
    assert(czech("dům") === "dom")            // ů -> o
  }

  test("hindi: normalizer folds + suffix strip") {
    assert(hindiNormalize("ख़राब") === "खराब")      // nukta consonant fold
    assert(hindiNormalize("ख" + "़") === "ख") // decomposed nukta deleted
    assert(hindiNormalize("लड़के") === "लडके")      // nukta inside word
    assert(hindi("लडके") === "लडक")                 // vowel sign strip
    assert(hindi("लडकियां") === "लडक")              // 4-char suffix
    assert(hindi("आदमी") === "आदम")                 // ी strip
  }

  test("latvian: vowel-gated affixes + unpalatalization") {
    assert(latvian("cilvēks") === "cilvēk")   // s affix
    assert(latvian("zaļi") === "zal")         // i affix palatalizes ļ -> l
    assert(latvian("gulbju") === "gulb")      // Cj -> C
    assert(latvian("rakšu") === "rakst")      // kš -> kst (u-cut rule)
    assert(latvian("es") === "es")            // too short / vowel guard
  }

  test("sorani: normalizer + suffix cascade") {
    assert(soraniNormalize("ي") === "ی")      // arabic yeh -> farsi yeh
    assert(soraniNormalize("ك") === "ک")      // kaf -> keheh
    assert(soraniNormalize("ماله") === "مالە") // final heh -> ae
    assert(soraniNormalize("رەش") === "ڕەش")  // initial reh -> rreh
    assert(sorani("پیاوان") === "پیاو")       // plural ان
    assert(sorani("پیاوەکە") === "پیاو")      // definite ەکە
  }

  test("indonesian: particles, possessives, prefix/suffix interplay") {
    assert(indonesian("bukunya") === "buku")      // possessive nya
    assert(indonesian("bukulah") === "buku")      // particle lah
    assert(indonesian("mengukur") === "ukur")     // meng-
    assert(indonesian("menyapu") === "sapu")      // meny+V -> s restoration
    assert(indonesian("kebijakan") === "bijak")   // ke- blocks -kan, -an fires
    assert(indonesian("pembangunan") === "bangun") // pem- + -an
  }
}

class RslpSpec extends AnyFunSuite {
  import Rslp._

  private val grammar =
    """# test grammar (rules from the published RSLP paper's plural step)
      |{ "Plural", 3, 1, {"s"},
      |  { "ns", 1, "m" },
      |  { "ões", 3, "ão" },
      |  { "es", 2, "", {"faces"} },
      |  { "s", 2 } };
      |""".stripMargin

  test("parse + apply: first-match, conds, min, whole-word exceptions") {
    val steps = parse(grammar)
    val plural = steps("Plural")
    assert(plural.apply("bons") === "bom")      // ns -> m (the paper's example)
    assert(plural.apply("balões") === "balão")  // ões -> ão
    assert(plural.apply("vozes") === "voz")     // es strip
    assert(plural.apply("faces") === "face")    // whole-word exception
    assert(plural.apply("bom") === "bom")       // cond 's' bypass
    assert(plural.apply("as") === "as")         // min-size bypass
  }

  test("suffix-exceptions (type 0) + minStem measured before replacement") {
    val steps = parse(
      """{ "T", 0, 0, {},
        |  { "ães", 1, "ão", {"cães"} } };
        |""".stripMargin)
    assert(steps("T").apply("alemães") === "alemão")
    assert(steps("T").apply("cães") === "cães")  // suffix exception
    // alemães also ends with a hypothetical exception only as a suffix —
    // whole-word mode would let it through; suffix mode blocks ANY tail
    // match, so "mães" fires here (stem "m" >= min 1)
    assert(steps("T").apply("mães") === "mão")
    assert(Rslp.stem(steps, Seq("T"))("alemães") === "alemão")
  }
}
