package graft.props

import graft.analysis.{BeiderMorse, KStemmer}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Robustness fuzz for the session-9 analysis engines: arbitrary inputs
  * must never throw, and the engines' structural contracts must hold on
  * every output — the BasePostingsFormatTestCase randomized pattern
  * applied to the stemmer/encoder surface (these run inside distributed
  * flatMaps, where one throwing input kills a whole task). */
object AnalysisFuzzProps extends Properties("AnalysisFuzz") {

  // ---- KStem ----

  private val kstem = new KStemmer(graft.ops.VerifyQueries.kstemGateLexicon)

  private val lowerWord: Gen[String] = for {
    n <- Gen.chooseNum(0, 60)
    cs <- Gen.listOfN(n, Gen.alphaLowerChar)
  } yield cs.mkString

  private val anyToken: Gen[String] = Gen.oneOf(
    lowerWord,
    Gen.listOf(Gen.oneOf(('a' to 'z') ++ "0123456789_$'-é日".toSeq))
      .map(_.mkString))

  property("KStem never throws; non-alpha and short/long inputs pass through") =
    forAll(anyToken) { t =>
      val out = kstem.stem(t)
      val alpha = t.nonEmpty && t.forall(c => c >= 'a' && c <= 'z')
      // declines at len<=2 or len>=50 (k = len-1 >= MaxWordLen-1)
      if (!alpha || t.length <= 2 || t.length >= 50) out == t
      else out.nonEmpty
    }

  property("KStem output stays lowercase alpha for alpha inputs") =
    forAll(lowerWord.suchThat(w => w.length > 2 && w.length < 49)) { w =>
      kstem.stem(w).forall(c => c >= 'a' && c <= 'z')
    }

  property("KStem is deterministic across repeated calls on one instance") =
    forAll(lowerWord) { w => kstem.stem(w) == kstem.stem(w) }

  // ---- Beider–Morse (over the spec's rule set) ----

  private val bm = new BeiderMorse(BeiderMorse.Generic, BeiderMorse.Approx,
    concat = true, graft.ops.VerifyQueries.bmRes)

  private val nameGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 12)
    cs <- Gen.listOfN(n, Gen.frequency(
      9 -> Gen.oneOf("abcdeghilmnorstvwyz".toSeq),
      1 -> Gen.oneOf(' ', '-', '\'')))
  } yield cs.mkString

  property("BeiderMorse never throws; every token is a clean alternative " +
           "or the filter's keep-original fallback") =
    forAll(nameGen) { name =>
      val toks = bm.encodeTokens(name)
      // the reference filter keeps the ORIGINAL term when the encode has
      // no [^()|-]+ alternative (e.g. all-separator input) — so a token
      // is either delimiter-free or exactly the input
      toks.nonEmpty && toks.forall(t =>
        (t.nonEmpty && !t.exists("()|-".contains(_))) || t == name)
    }

  property("BeiderMorse alternatives are sorted and distinct after final rules") =
    forAll(nameGen.suchThat(n => !n.exists(" -'".contains(_)))) { name =>
      // single word, concat: encode = '|' join of the final sorted set
      val enc = bm.encode(name)
      val alts = enc.split("\\|").toSeq.filter(_.nonEmpty)
      alts == alts.sorted && alts.distinct == alts
    }

  property("BeiderMorse language guessing is total (never empty)") =
    forAll(nameGen) { name => bm.guessLanguages(name) != BeiderMorse.NoLangs }
}
