package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import Normalizers._

class NormalizersSpec extends AnyFunSuite {

  test("scandinavianFolding: the documented equivalence class collapses") {
    // blåbærsyltetøj == blåbärsyltetöj == blaabaarsyltetoej == blabarsyltetoj
    val expect = "blabarsyltetoj"
    assert(scandinavianFolding("blåbærsyltetøj") === expect)
    assert(scandinavianFolding("blåbärsyltetöj") === expect)
    assert(scandinavianFolding("blaabaarsyltetoej") === expect)
    assert(scandinavianFolding("blabarsyltetoj") === expect)
    // räksmörgås family
    assert(scandinavianFolding("räksmörgås") === "raksmorgas")
    assert(scandinavianFolding("ræksmørgås") === "raksmorgas")
    assert(scandinavianFolding("raeksmoergaas") === "raksmorgas")
  }

  test("scandinavianNormalization: transcriptions restore national letters") {
    assert(scandinavianNormalization("blaabaersyltetoej") === "blåbærsyltetøj")
    assert(scandinavianNormalization("blåbärsyltetöj") === "blåbærsyltetøj")
    assert(scandinavianNormalization("raeksmoergaos") === "ræksmørgås")
    assert(scandinavianNormalization("ae") === "æ")
    assert(scandinavianNormalization("aa") === "å")
    assert(scandinavianNormalization("ao") === "å")
    assert(scandinavianNormalization("oo") === "ø")
  }

  test("germanNormalization: umlaut folds, ue/oe deletion gated by the " +
       "state machine, sharp s") {
    assert(germanNormalization("häuser") === "hauser")
    assert(germanNormalization("straße") === "strasse")
    // ue after a consonant-state u? 'fuer': f->N, u->U, e after U deleted
    assert(germanNormalization("fuer") === "fur")
    // after q the state is V, so 'que' keeps its e
    assert(germanNormalization("quelle") === "quelle")
    // 'aue': a->U, u->V (state was U), e kept
    assert(germanNormalization("aue") === "aue")
  }

  test("arabic + persian normalizers") {
    // alef madda/hamza fold, diacritic stripped
    assert(arabicNormalize("أحمَد") === "احمد")
    assert(arabicNormalize("آب") === "اب")
    assert(arabicNormalize("مكتبة") === "مكتبه") // teh marbuta -> heh
    assert(persianNormalize("می") === "مي")      // farsi yeh -> yeh
    assert(persianNormalize("ک") === "ك")        // keheh -> kaf
  }

  test("hyphenatedWords: line-break hyphens re-joined, offsets span, " +
       "trailing hyphen restored at EOS") {
    def t(w: String, p: Int, s: Int): Token = Token(w, p, s, s + w.length)
    val in = Array(t("ecologi-", 0, 0), t("cal", 1, 9), t("plain", 2, 13),
      t("devel-", 3, 19), t("op", 4, 26))
    val out = hyphenatedWords(in)
    assert(out.map(x => (x.term, x.position, x.startOff, x.endOff)).toSeq ===
      Seq(("ecological", 0, 0, 12), ("plain", 2, 13, 18),
          ("develop", 3, 19, 28)))
    // EOS mid-accumulation restores the hyphen
    assert(hyphenatedWords(Array(t("dan-", 0, 0))).head.term === "dan-")
  }

  test("thaiTokenize: dictionary segmentation (the ThaiAnalyzer vector)") {
    // Lucene's canonical test: การที่ได้ต้องแสดงว่างานดี
    val ts = thaiTokenize("การที่ได้ต้องแสดงว่างานดี")
    assert(ts.map(_.term).toSeq ===
      Seq("การ", "ที่", "ได้", "ต้อง", "แสดง", "ว่า", "งาน", "ดี"))
    assert(ts.head.startOff === 0)
    assert(ts.last.endOff === 25)
    // spaces and punctuation are skipped, positions run
    assert(thaiTokenize("ภาษาไทย ok").map(_.term).toSeq ===
      Seq("ภาษา", "ไทย", "ok"))
  }

  test("parseWordnet: synset grouping with quote escapes") {
    val m = Synonyms.parseWordnet(
      """s(100001740,1,'entity',n,1,11).
        |s(100001740,2,'thing',n,1,0).
        |s(200001740,1,'o''clock',r,1,0).
        |s(200001740,2,'sharp',r,1,0).
        |""".stripMargin)
    val out = Synonyms.filter(Array(Token("entity", 0, 0, 6)), m)
    assert(out.map(_.term).toSet === Set("entity", "thing"))
    val out2 = Synonyms.filter(Array(Token("o'clock", 0, 0, 7)), m)
    assert(out2.map(_.term).toSet === Set("o'clock", "sharp"))
  }
}
