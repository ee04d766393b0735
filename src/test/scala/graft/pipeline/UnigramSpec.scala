package graft.pipeline

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Unigram-LM tokenizer (SentencePiece): hand-traced E-step lattice,
  * Viterbi tie-breaks, distributed-EM == local math, seed selection,
  * prune-free EM monotonicity, encode census. The seed census's
  * engine-vs-engine parity is the driver gate (`q_unigram_seed`). */
class UnigramSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def close(a: Double, b: Double, eps: Double = 1e-9) =
    assert(math.abs(a - b) < eps, s"$a vs $b")

  test("E-step lattice, hand-traced: 'ab' under {a:.25, b:.25, ab:.5}") {
    val m = Map("a" -> math.log(0.25), "b" -> math.log(0.25), "ab" -> math.log(0.5))
    val (cnt, ll) = Unigram.expectedCounts("ab", m)
    // segmentations: [ab] p=.5, [a,b] p=.0625; total .5625
    close(ll, math.log(0.5625))
    close(cnt("ab"), 0.5 / 0.5625)  // 8/9
    close(cnt("a"), 0.0625 / 0.5625) // 1/9
    close(cnt("b"), 0.0625 / 0.5625)
    // unsegmentable word
    val (c2, ll2) = Unigram.expectedCounts("xy", m)
    assert(c2.isEmpty && ll2 == Double.NegativeInfinity)
  }

  test("Viterbi: max-prob path; exact tie prefers the longer final piece") {
    val m = Map("a" -> math.log(0.25), "b" -> math.log(0.25), "ab" -> math.log(0.5))
    assert(Unigram.viterbiSegment("ab", m) === Seq("ab"))
    assert(Unigram.viterbiSegment("ba", m) === Seq("b", "a"))
    // engineered EXACT tie in log space: [ab] = -2.0 == [a, b] = -1 + -1
    val tie = Map("ab" -> -2.0, "a" -> -1.0, "b" -> -1.0)
    assert(Unigram.viterbiSegment("ab", tie) === Seq("ab"), "longer final piece wins ties")
    assert(Unigram.viterbiSegment("zq", m) === Nil, "unsegmentable -> empty")
  }

  test("seed census + vocab: hand-counted substrings, singles always kept") {
    val docs = Seq((0L, "ab ab b")).toDF("doc_id", "text")
    val census = Unigram.seedCensus(docs)
      .as[(String, Long)].collect().toMap
    assert(census === Map("a" -> 2L, "b" -> 3L, "ab" -> 2L))
    val v = Unigram.seedVocab(docs, seedSize = 2)
    // top-2 = b(3), a(2) (tie a-vs-ab broken piece-asc) ∪ singles {a, b}
    assert(v.keySet === Set("a", "b"))
    close(v("b"), math.log(3.0 / 5.0))
    close(v("a"), math.log(2.0 / 5.0))
  }

  test("distributed EM round == local lattice math; prune-free EM is monotone") {
    val docs = Seq((0L, "ab ab b ba")).toDF("doc_id", "text")
    val wt = Bpe.wordTypes(docs)
    val m0 = Map("a" -> math.log(0.2), "b" -> math.log(0.3), "ab" -> math.log(0.5))
    val (m1, ll1) = Unigram.emRound(wt, m0)
    // local twin: word types ab(2), b(1), ba(1)
    val local = Seq(("ab", 2L), ("b", 1L), ("ba", 1L))
    val exp = scala.collection.mutable.Map.empty[String, Double].withDefaultValue(0.0)
    var llLocal = 0.0
    local.foreach { case (w, n) =>
      val (c, ll) = Unigram.expectedCounts(w, m0)
      c.foreach { case (p, v) => exp(p) += n * v }
      llLocal += n * ll
    }
    close(ll1, llLocal, 1e-6)
    val z = exp.values.sum
    m1.foreach { case (p, lp) => close(lp, math.log(exp(p) / z), 1e-6) }
    val (_, ll2) = Unigram.emRound(wt, m1)
    assert(ll2 >= ll1 - 1e-9, s"EM must not decrease likelihood: $ll1 -> $ll2")
  }

  test("encode census: Viterbi usage counts weighted by word frequency") {
    val docs = Seq((0L, "ab ab b")).toDF("doc_id", "text")
    val m = Map("a" -> math.log(0.25), "b" -> math.log(0.25), "ab" -> math.log(0.5))
    val census = Unigram.encodeCensus(docs, m)
      .as[(String, Long)].collect().toMap
    assert(census === Map("ab" -> 2L, "b" -> 1L))
  }

  test("train end-to-end: prunes toward the target, keeps singles, model segments the corpus") {
    val docs = Seq((0L, "merge merge merge table table index")).toDF("doc_id", "text")
    val m = Unigram.train(docs, seedSize = 30, rounds = 3, pruneTo = 12)
    assert(m.nonEmpty)
    // every single char of the corpus words survives pruning
    val chars = "mergetablindx".toSet.map((c: Char) => c.toString)
    assert(chars.subsetOf(m.keySet), s"missing singles: ${chars diff m.keySet}")
    // the trained model can segment every corpus word
    Seq("merge", "table", "index").foreach { w =>
      assert(Unigram.viterbiSegment(w, m).mkString === w)
    }
    // probabilities normalized (within float tolerance)
    close(m.values.map(math.exp).sum, 1.0, 1e-6)
  }
}
