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
  }
}
