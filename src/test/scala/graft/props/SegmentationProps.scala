package graft.props

import graft.analysis.{Kuromoji, SmartCn, Stempel}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Randomized theorems for the session-7 modules: the lattice/graph
  * Viterbi implementations against brute-force enumeration of every
  * segmentation, and the Egothor patch generator against its own
  * interpreter. */
object SegmentationProps extends Properties("Segmentation") {

  // ---- Kuromoji: lattice Viterbi == brute-force least cost ----

  // small alphabet of kanji digits so lexicon entries actually match
  private val kChars = "一二三"
  private val wordGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 3)
    cs <- Gen.listOfN(n, Gen.oneOf(kChars.toSeq))
  } yield cs.mkString

  private val lexGen: Gen[Seq[Kuromoji.JaEntry]] = for {
    extra <- Gen.listOfN(4, wordGen)
    costs <- Gen.listOfN(extra.length + 3, Gen.chooseNum(100, 5000))
  } yield {
    // unigrams always present so every string is coverable
    val surfaces = kChars.map(_.toString) ++ extra
    surfaces.distinct.zip(costs).map { case (s, c) =>
      Kuromoji.JaEntry(s, 0, 0, c) }
  }

  private val textGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 7)
    cs <- Gen.listOfN(n, Gen.oneOf(kChars.toSeq))
  } yield cs.mkString

  /** every segmentation of s into lexicon surfaces, with its total cost
    * (conn costs are zero here; NORMAL mode = no penalties). */
  private def bruteBest(s: String, lex: Map[String, Int]): Int = {
    if (s.isEmpty) return 0
    val options = for {
      n <- 1 to s.length
      w = s.substring(0, n) if lex.contains(w)
    } yield lex(w) + bruteBest(s.substring(n), lex)
    options.min
  }

  property("Kuromoji NORMAL Viterbi == brute-force least cost") =
    forAll(lexGen, textGen) { (entries, text) =>
      val tok = new Kuromoji(entries)
      val lex = entries.map(e => e.surface -> e.cost).toMap
      val segs = tok.tokenize(text)
      // the emitted segmentation spells the text and is lexicon-valid
      val spells = segs.map(_.term).mkString == text
      val cost = segs.map(t => lex(t.term)).sum
      spells && cost == bruteBest(text, lex)
    }

  // ---- SmartCn: bigram-graph shortest path == brute force ----

  private val cnLexGen: Gen[Map[String, Int]] = for {
    extra <- Gen.listOfN(3, wordGen)
    freqs <- Gen.listOfN(extra.length + 3, Gen.chooseNum(0, 2000000))
  } yield (kChars.map(_.toString) ++ extra).distinct.zip(freqs).toMap

  private def cnBrute(s: String, sc: SmartCn, dict: Map[String, Int]): Double = {
    import SmartCn._
    def tok(w: String, at: Int) =
      SegToken(w, w, at, at + w.length, ChineseWord, dict.getOrElse(w, 0))
    val start = SegToken(StartId, "", -1, 0, Marker, dict.getOrElse(StartId, 0))
    val end = SegToken(EndId, "", s.length, s.length + 1, Marker,
      dict.getOrElse(EndId, 0))
    def best(at: Int, prev: SegToken): Double =
      if (at == s.length) sc.edgeWeight(prev, end)
      else {
        val opts = for {
          n <- 1 to (s.length - at)
          w = s.substring(at, at + n)
          // single hanzi always a token; longer needs the dictionary
          if n == 1 || dict.contains(w)
          t = tok(w, at)
        } yield sc.edgeWeight(prev, t) + best(at + n, t)
        opts.min
      }
    best(0, start)
  }

  property("SmartCn shortest path == brute-force over all segmentations") =
    forAll(cnLexGen, textGen) { (dict, text) =>
      val sc = new SmartCn(dict)
      val segs = sc.segment(text)
      val spells = segs.map(_.surface).mkString == text
      // recompute the engine path's cost and compare to brute force
      import SmartCn._
      val start = SegToken(StartId, "", -1, 0, Marker, dict.getOrElse(StartId, 0))
      val end = SegToken(EndId, "", text.length, text.length + 1, Marker,
        dict.getOrElse(EndId, 0))
      val chain = (start +: segs.toSeq) :+ end
      val cost = chain.sliding(2).map { case Seq(a, b) => sc.edgeWeight(a, b) }.sum
      spells && math.abs(cost - cnBrute(text, sc, dict)) < 1e-9
    }

  // ---- Stempel: apply(a, diff(a, b)) == b for random word pairs ----

  private val letterGen = Gen.oneOf(('a' to 'f').toSeq)
  private val smallWord: Gen[String] = for {
    n <- Gen.chooseNum(1, 8)
    cs <- Gen.listOfN(n, letterGen)
  } yield cs.mkString

  property("Egothor apply(diff(a,b)) == b") =
    forAll(smallWord, smallWord) { (a, b) =>
      Stempel.applyPatch(a, Stempel.diff(a, b)) == b
    }
}
