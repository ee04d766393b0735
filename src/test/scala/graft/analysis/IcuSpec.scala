package graft.analysis

import org.scalatest.funsuite.AnyFunSuite
import Icu._

class IcuSpec extends AnyFunSuite {

  test("scriptRuns: concrete-script boundaries; Common/Inherited attach") {
    import Character.UnicodeScript._
    assert(scriptRuns("abc一二def").map(r => (r._1, r._2, r._3)) ===
      Seq((0, 3, LATIN), (3, 5, HAN), (5, 8, LATIN)))
    // trailing Common (space) continues the current run
    assert(scriptRuns("abc 一二") === Seq((0, 4, LATIN), (4, 6, HAN)))
    // leading Common adopts the first concrete script
    assert(scriptRuns(" 一") === Seq((0, 2, HAN)))
    // only-Common text is one COMMON run
    assert(scriptRuns("123 456") === Seq((0, 7, COMMON)))
    // combining mark (Inherited) never splits its base's run
    assert(scriptRuns("é一") === Seq((0, 2, LATIN), (2, 3, HAN)))
  }

  test("tokenize: per-run UAX#29 with the ScriptAttribute, global offsets") {
    val ts = tokenize("x一二y")
    assert(ts.map(t => (t.term, t.script, t.startOff, t.endOff, t.tpe)).toSeq ===
      Seq(("x", "LATIN", 0, 1, "<ALPHANUM>"),
          ("一", "HAN", 1, 2, "<IDEOGRAPHIC>"),
          ("二", "HAN", 2, 3, "<IDEOGRAPHIC>"),
          ("y", "LATIN", 3, 4, "<ALPHANUM>")))
    assert(tokenize("123 456").map(t => (t.term, t.script)).toSeq ===
      Seq(("123", "COMMON"), ("456", "COMMON")))
    // a latin word is NOT merged across an intervening han run
    assert(tokenize("ab一cd").map(_.term).toSeq === Seq("ab", "一", "cd"))
  }

  test("nfkc / nfkc_cf: compatibility + case fold + recomposition") {
    assert(nfkc("ﬁre") === "fire")
    assert(nfkcCaseFold("ＡＢＣ") === "abc")
    assert(nfkcCaseFold("Ⅻ") === "xii")
    assert(nfkcCaseFold("Straße") === "strasse")
    assert(nfkcCaseFold("ẞ") === "ss")
    assert(nfkcCaseFold("CAFÉ") === "café")
    // fold result recomposes (é stays one codepoint)
    assert(nfkcCaseFold("CAFÉ").length === 4)
  }
}
