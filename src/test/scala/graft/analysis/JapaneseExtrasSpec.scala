package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import JapaneseExtras._

class JapaneseExtrasSpec extends AnyFunSuite {

  test("iteration marks: kana/kanji spans repeat source chars") {
    assert(normalizeIterationMarks("こゝろ") === "こころ")
    assert(normalizeIterationMarks("学生々々") === "学生学生") // 2-mark span
    assert(normalizeIterationMarks("かゞ") === "かが")        // voiced applies dakuten
    assert(normalizeIterationMarks("がゝ") === "がか")        // plain devoices
    // katakana voiced mark over a self-mapped (no-dakuten) row: copies
    assert(normalizeIterationMarks("バナヾ") === "バナナ")
  }

  test("iteration marks: clamped span + illegal continuation verbatim") {
    // one source char, two marks: span clamps to 1, the second mark is
    // illegal (starts at the previous span's end) and passes through
    assert(normalizeIterationMarks("さゝゝ") === "ささゝ")
    // a mark with nothing before it is illegal
    assert(normalizeIterationMarks("ゝか") === "ゝか")
    // full stop resets the span source
    assert(normalizeIterationMarks("か。ゝ") === "か。ゝ")
    // flags off: marks pass through
    assert(normalizeIterationMarks("学生々々", normalizeKanji = false) === "学生々々")
  }

  test("romanize: modified-Hepburn conventions of ToStringUtil") {
    assert(romanize("トウキョウ") === "tōkyō")   // o+ウ and digraph+ウ macrons
    assert(romanize("シンブン") === "shimbun")   // ン before b-row => m
    assert(romanize("ケンイチ") === "ken'ichi")  // ン before vowel => n'
    assert(romanize("ガッコウ") === "gakkō")     // sokuon doubles k
    assert(romanize("マッチャ") === "matcha")    // t before ch
    assert(romanize("ラーメン") === "ramen")     // prolonged mark dropped
    assert(romanize("ジャズ") === "jazu")
    assert(romanize("ツヲフ") === "tsuofu")
  }

  test("readingForm swaps the term for the reading (katakana or romaji)") {
    val ts = Array(
      Kuromoji.JaToken("寿司", 0, 2, 1, 1, known = true, reading = "スシ"),
      Kuromoji.JaToken("x", 2, 3, 1, 1, known = false))
    assert(readingForm(ts).map(_.term).toSeq === Seq("スシ", "x"))
    assert(readingForm(ts, useRomaji = true).map(_.term).toSeq ===
      Seq("sushi", "x"))
  }
}
