package graft.props

import graft.analysis.{ClassicTokenizer, LightStemmers3, TokenFilters2, Tokenizers}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Robustness fuzz for the session-10/11 analysis surface: the stemmer
  * pack, the classic scanner and the new filters run inside distributed
  * flatMaps where one throwing input kills a task — arbitrary inputs
  * must never throw, and each engine's structural contract must hold. */
object Session10FuzzProps extends Properties("Session10Fuzz") {

  private val anyText: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf(('a' to 'z') ++ "0123456789 .,-_/@&'\"é日ß㐀ヺ｡ﾞ？Ｔ".toSeq))
      .map(_.mkString),
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf("áéíóúàèìòùâêîôûäëïöüãõçñøåæßёьъ日本語ﾊﾟｶ".toSeq))
      .map(_.mkString))

  private val lowerWord: Gen[String] = for {
    n <- Gen.chooseNum(0, 40)
    cs <- Gen.listOfN(n, Gen.oneOf(('a' to 'z') ++ "áéíóúàèìòùâêîôûäëïöüãõçß".toSeq))
  } yield cs.mkString

  property("light/minimal pack 3: total, never grows past one rewrite") =
    forAll(lowerWord) { w =>
      LightStemmers3.byName.values.forall { stem =>
        val out = stem(w)
        // suffix rewrites may substitute but never lengthen by more
        // than the largest replacement delta (RSLP 'ás'→'al' etc. = +1)
        out.length <= w.length + 1
      }
    }

  property("light/minimal pack 3: deterministic") =
    forAll(lowerWord) { w =>
      LightStemmers3.byName.values.forall(s => s(w) == s(w))
    }

  property("russian light is total over Cyrillic too") =
    forAll(Gen.listOf(Gen.oneOf(('а' to 'я') ++ Seq('ё'))).map(_.mkString)) { w =>
      val out = LightStemmers3.russianLight(w)
      out.length <= w.length
    }

  property("classic tokenizer: offsets are sane, types from the closed set") =
    forAll(anyText) { s =>
      val toks = ClassicTokenizer.tokenize(s)
      toks.forall { t =>
        t.startOff >= 0 && t.endOff <= s.length && t.startOff < t.endOff &&
        t.term.nonEmpty &&
        Set("<ALPHANUM>", "<APOSTROPHE>", "<ACRONYM>", "<COMPANY>",
          "<EMAIL>", "<HOST>", "<NUM>", "<CJ>").contains(t.tpe)
      } && toks.sliding(2).forall {
        case Array(a, b) => a.endOff <= b.startOff
        case _ => true
      }
    }

  property("classic filter never throws and keeps offsets") =
    forAll(anyText) { s =>
      val ts = ClassicTokenizer.tokenizeFiltered(s)
      ts.forall(t => t.startOff >= 0 && t.endOff <= s.length)
    }

  property("cjkWidth is total and idempotent") =
    forAll(anyText) { s =>
      val once = TokenFilters2.cjkWidthTerm(s)
      TokenFilters2.cjkWidthTerm(once) == once
    }

  private def tok(ts: Seq[String]) = ts.zipWithIndex.map { case (t, i) =>
    graft.analysis.Token(t, i, 0, t.length) }.toArray

  property("commonGramsQuery: no unigram that a gram absorbed survives, " +
      "positions consecutive") =
    forAll(Gen.listOf(Gen.oneOf("the", "of", "fox", "quick", "brown"))) { words =>
      val out = TokenFilters2.commonGramsQuery(tok(words), Set("the", "of"))
      out.map(_.position).toSeq == out.indices.toSeq &&
      (words.isEmpty || out.nonEmpty || words.isEmpty)
    }

  property("ngram tokenizers: every gram is a substring at its offsets") =
    forAll(Gen.asciiPrintableStr, Gen.chooseNum(1, 3), Gen.chooseNum(0, 2)) {
      (s, minG, extra) =>
        val g = Tokenizers.ngramTokenize(minG, minG + extra)(s)
        val e = Tokenizers.edgeNGramTokenize(minG, minG + extra)(s)
        (g ++ e).forall(t => s.substring(t.startOff, t.endOff) == t.term)
    }

  property("patternCaptureGroups: without preserveOriginal, exactly the " +
      "original survives when nothing captures") =
    forAll(Gen.alphaLowerStr) { w =>
      val out = TokenFilters2.patternCaptureGroups(tok(Seq(w)), Seq("(x{50})"))
      out.map(_.term).toSeq == Seq(w)
    }
}
