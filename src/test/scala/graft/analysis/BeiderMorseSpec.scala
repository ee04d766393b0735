package graft.analysis

import org.scalatest.funsuite.AnyFunSuite

/** Beider–Morse engine vectors over a hand-authored rule set in the
  * reference file grammar (PhoneticEngine.cs/Rule.cs/Lang.cs semantics) —
  * every encode hand-traced: language guessing (accept/subtract/empty→ANY),
  * singleton-vs-any rule selection, the alternation cross-product with
  * language restriction, final-rule rewriting with sorted '|' output, the
  * GENERIC d'/prefix double encode, the Sephardic apostrophe split, the
  * reference's one-word words.First() quirk, and the maxPhonemes cap. */
class BeiderMorseSpec extends AnyFunSuite {
  import BeiderMorse._

  // the ONE shared rule set: the gate's oracle truth table is hand-traced
  // against exactly these rules, so the spec and the gate cannot drift
  private val res: Map[String, String] = graft.ops.VerifyQueries.bmRes

  private def ashRes: Map[String, String] =
    res.map { case (k, v) => k.replace("gen_", "ash_") -> v } ++
      res.filterNot(_._1.startsWith("gen_"))

  private val eng = new BeiderMorse(Generic, Approx, concat = true, res)

  test("language guessing drives per-language rule selection") {
    assert(eng.guessLanguages("schmidt") === SomeLangs(Set("ger")))
    assert(eng.guessLanguages("smith") === SomeLangs(Set("eng")))
    assert(eng.guessLanguages("weber") === SomeLangs(Set("eng", "ger")))
    // sch AND th: {ger} ∩ {eng} = ∅ → ANY (the empty→any fallback)
    assert(eng.guessLanguages("schmith") === AnyLang)
  }

  test("cross-language unification: schmidt and smith meet at 'smit'") {
    assert(eng.encode("schmidt") === "smit") // ger rules + final dt→t
    assert(eng.encode("smith") === "smit")   // eng rules, th→t
    assert(eng.encode("schmith") === "smit") // any rules via the ∅→ANY path
  }

  test("ambiguous language: alternation emits both renderings, sorted") {
    assert(eng.encode("weber") === "veber|weber")
    assert(eng.encode("wagner") === "vagner|wagner")
    assert(eng.encodeTokens("weber") === Seq("veber", "weber"))
  }

  test("singleton guesses use that language's rule file") {
    assert(eng.encode("thiele") === "tiele")
    assert(eng.encode("schneider") === "sneider")
    assert(eng.encode("meyer") === "meyer")
  }

  test("GENERIC name prefixes double-encode: with and without the prefix") {
    assert(eng.encode("van helsing") === "(helsing)-(vanhelsing)")
    assert(eng.encodeTokens("van helsing") === Seq("helsing", "vanhelsing"))
    assert(eng.encode("d'arcy") === "(arcy)-(darcy)")
  }

  test("Ashkenazi: prefixes filtered from words2, but the one-word case " +
       "falls back to words.First() — the reference's quirk, preserved") {
    val ash = new BeiderMorse(Ashkenazi, Approx, concat = false, ashRes)
    assert(ash.encode("van helsing") === "van")
    // two non-prefix words, concat=false → each encoded, '-'-joined
    assert(ash.encode("meyer thiele") === "meyer-tiele")
  }

  test("Sephardic: apostrophe keeps the last part") {
    val sep = new BeiderMorse(Sephardic, Approx, concat = true,
      res.map { case (k, v) => k.replace("gen_", "sep_") -> v } ++
        res.filterNot(_._1.startsWith("gen_")))
    assert(sep.encode("d'oro") === "oro")
  }

  test("maxPhonemes caps the cross-product") {
    val capped = new BeiderMorse(Generic, Approx, concat = true, res,
      maxPhonemes = 1)
    assert(capped.encode("weber") === "veber") // ger branch first, cap 1
  }

  test("main pass DROPS unmatched chars; final pass keeps them") {
    // 'z' and 'f' have no main rule → silently skipped (BMPM contract)
    assert(eng.encode("sz") === "s")
    assert(eng.encode("fa") === "a")
  }

  test("rule grammar: quotes, comments, includes, phoneme lists") {
    val rules = parseRules(
      """/* extended
        |comment */
        |"ab" "c$x" "^y" "(p[eng]|q|)" // trailing comment
        |#include base.txt
        |""".stripMargin.replace("$x", ""), res(_))
    val ab = rules("a").head
    assert(ab.pattern === "ab")
    assert(ab.phoneme.phonemes.map(_.text) === Seq("p", "q", ""))
    assert(rules("b").head.pattern === "b") // via include
  }

  test("languages file: extended comment blocks are skipped statefully") {
    // the shipped BMPM resources open with a multi-line license block —
    // interior lines must not become languages (Languages.cs inExtendedComment)
    assert(parseLanguages(
      "/*\n * Licensed to the Apache Software Foundation\n */\neng\nger\n")
      === Set("eng", "ger"))
  }

  test("context pattern fast paths match their regex semantics") {
    assert(compileContext("abc$")("xabc") && !compileContext("abc$")("abcx"))
    assert(compileContext("^abc")("abcx") && !compileContext("^abc")("xabc"))
    assert(compileContext("^abc$")("abc") && !compileContext("^abc$")("abcd"))
    assert(compileContext("^$")("") && !compileContext("^$")("a"))
    assert(compileContext("[aeiou]$")("xk e".replace(" ", "")))
    assert(!compileContext("[aeiou]$")("xk"))
    assert(compileContext("^[^aeiou]")("kx") && !compileContext("^[^aeiou]")("ax"))
    assert(compileContext("^[ab]$")("a") && !compileContext("^[ab]$")("ab"))
    // the reference treats non-'[' contexts as LITERALS (GetPattern's
    // fast paths fire before any regex compile) — so '.' is a dot
    assert(!compileContext("a.c$")("zabc") && compileContext("a.c$")("za.c"))
    // general fallback (a '[' that isn't a pure one-char box): find-anywhere
    assert(compileContext("[ab]c$")("zbc") && !compileContext("[ab]c$")("zc"))
  }
}
