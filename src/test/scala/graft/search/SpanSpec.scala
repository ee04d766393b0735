package graft.search

import graft.SparkTestSession
import graft.build.IndexBuilder
import graft.corpus.{CorpusGen, SourceFile}
import org.scalatest.funsuite.AnyFunSuite

/** Span algebra (SpanOr / SpanNot / SpanFirst / n-clause SpanNear
  * ordered+unordered, nested) — reference: Search/Spans/. */
class SpanSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk(i: Int, text: String) =
    SourceFile("r", f"f$i%02d", "0" * 40, "txt", text, CorpusGen.sha256Hex(text))

  // positions:            0     1     2     3     4     5
  private val fixture = Seq(
    mk(0, "alpha beta gamma alpha delta beta"),
    mk(1, "gamma alpha beta epsilon zeta eta"),
    mk(2, "beta zeta alpha"),
    mk(3, "unrelated words only here"))

  private lazy val searcher: Searcher = {
    import spark.implicits._
    val d = SparkTestSession.tmpDir("graft-span-")
    IndexBuilder.build(spark, spark.createDataset(fixture), d, numPartitions = 2,
      analyzerFor = _ => graft.analysis.Analyzer.noStop)
    new Searcher(new IndexReader(spark, d),
      analyzerFor = _ => graft.analysis.Analyzer.noStop)
  }

  private def counts(q: SpanQuery): Map[Long, Int] =
    searcher.spanCount(q).collect().toMap

  test("spanOr: union of term occurrences") {
    val c = counts(SpanOrQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta"))))
    assert(c === Map(0L -> 4, 1L -> 2, 2L -> 2))
  }

  test("spanFirst: spans ending within the first n positions") {
    // alpha positions: doc0 {0,3}, doc1 {1}, doc2 {2}; end <= 2 keeps
    // spans with position < 2
    val c = counts(SpanFirstQ(SpanTermQ("alpha"), 2))
    assert(c === Map(0L -> 1, 1L -> 1))
  }

  test("spanNot: include spans overlapping no exclude span") {
    // 'alpha' occurrences NOT inside an ordered [alpha beta] pair-with-gap0
    val pair = SpanNearQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta")), 0, inOrder = true)
    val c = counts(SpanNotQ(SpanTermQ("alpha"), pair))
    // doc0: alpha@0 begins [alpha beta]@0-2 → excluded; alpha@3? near
    //   chain alpha@3 → beta@5 gap 1 > 0 so no pair at 3... but pair
    //   spans are (0,2) and... alpha@3: find beta with start>=4 → beta@5,
    //   width (3..6)=3, len 2, slop 1 > 0 → no match; pair spans = {(0,2)};
    //   alpha@0 overlaps (0,2) → dropped; alpha@3 survives → 1
    // doc1: alpha@1 beta@2 adjacent → pair (1,3) covers alpha@1 → dropped
    // doc2: alpha@2, beta@0 — no ordered pair → alpha survives → 1
    assert(c === Map(0L -> 1, 2L -> 1))
  }

  test("spanNot pre/post widen the exclusion window (SpanNotQuery.cs:187-192)") {
    // plain: 'beta' spans not overlapping 'alpha' = every beta
    assert(counts(SpanNotQ(SpanTermQ("beta"), SpanTermQ("alpha"))) ===
      Map(0L -> 2, 1L -> 1, 2L -> 1))
    // killed iff ∃ alpha e: e.end > beta.start − pre AND e.start < beta.end + post
    // pre=1: alpha ending within 1 position BEFORE beta kills it
    //   doc0: beta(1,2) killed by alpha(0,1) (1 > 0, 0 < 2);
    //         beta(5,6) survives (alpha(3,4): 4 > 4 is false) → 1
    //   doc1: beta(2,3) killed by alpha(1,2) (2 > 1, 1 < 3) → gone
    //   doc2: beta(0,1) survives (alpha(2,3) starts 2 ≥ 1) → 1
    assert(counts(SpanNotQ(SpanTermQ("beta"), SpanTermQ("alpha"), pre = 1)) ===
      Map(0L -> 1, 2L -> 1))
    // post=2: alpha starting within 2 positions AFTER beta kills it
    //   doc0: beta(1,2) killed by alpha(3,4) (4 > 1, 3 < 4);
    //         beta(5,6) survives → 1
    //   doc1: beta(2,3) survives (alpha(1,2): end 2 > 2 is false) → 1
    //   doc2: beta(0,1) killed by alpha(2,3) (3 > 0, 2 < 3) → gone
    assert(counts(SpanNotQ(SpanTermQ("beta"), SpanTermQ("alpha"), post = 2)) ===
      Map(0L -> 1, 1L -> 1))
  }

  test("spanNear ordered: 3-clause chains within slop") {
    val q3 = SpanNearQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta"),
      SpanTermQ("gamma")), 0, inOrder = true)
    // doc0: alpha@0 beta@1 gamma@2 adjacent → 1 chain; alpha@3 has no
    // later gamma → stop
    assert(counts(q3) === Map(0L -> 1))
    // ordered rejects doc1 (gamma precedes alpha beta); slop lets nothing in
    val loose = SpanNearQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta"),
      SpanTermQ("gamma")), 5, inOrder = true)
    assert(!counts(loose).contains(1L))
  }

  test("spanNear unordered: window fits all clauses regardless of order") {
    val q = SpanNearQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta"),
      SpanTermQ("gamma")), 0, inOrder = false)
    // doc1: gamma@0 alpha@1 beta@2 — window 0..3, width 3 - len 3 = 0 ≤ 0
    assert(counts(q).contains(1L))
    assert(counts(q).contains(0L))
    // doc2 has no gamma → intersection prunes it before re-analysis
    assert(!counts(q).contains(2L))
  }

  test("span algebra over the positions sidecar == re-analysis") {
    import spark.implicits._
    val d = SparkTestSession.tmpDir("graft-span-pos-")
    IndexBuilder.build(spark, spark.createDataset(fixture), d, numPartitions = 2,
      analyzerFor = _ => graft.analysis.Analyzer.noStop, indexPositions = true)
    val sPos = new Searcher(new IndexReader(spark, d),
      analyzerFor = _ => graft.analysis.Analyzer.noStop)
    for (q <- Seq[SpanQuery](
      SpanOrQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta"))),
      SpanFirstQ(SpanTermQ("alpha"), 2),
      SpanNotQ(SpanTermQ("alpha"),
        SpanNearQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta")), 0, inOrder = true)),
      SpanNearQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta"), SpanTermQ("gamma")), 0,
        inOrder = false))) {
      assert(sPos.spanCount(q).collect().toMap === counts(q), s"query $q")
    }
  }

  test("nested: or inside near; absent terms prune structurally") {
    val q = SpanNearQ(Seq(
      SpanOrQ(Seq(SpanTermQ("gamma"), SpanTermQ("zeta"))),
      SpanTermQ("alpha")), 1, inOrder = true)
    // doc0: gamma@2 → alpha@3 (adjacent) → match
    // doc1: gamma@0 → alpha@1 → match
    // doc2: zeta@1 → alpha@2 → match
    assert(counts(q).keySet === Set(0L, 1L, 2L))
    // a query over only-absent terms matches nothing
    assert(counts(SpanOrQ(Seq(SpanTermQ("qqqq")))).isEmpty)
  }

  test("nearOrdered with multi-width sub-spans: shorter later span beats earliest wide one") {
    // reference NearSpansOrdered advances/shrinks inner spans — taking the
    // earliest-start sub-span greedily would chain through (1,9) and miss
    // the valid chain through (2,4)
    val pos = Map(
      "a" -> Array(0), "b" -> Array(1), "c" -> Array(8),
      "e" -> Array(2), "f" -> Array(3), "g" -> Array(5))
    val posOf: String => Array[Int] = t => pos.getOrElse(t, Array.empty)
    val inner = SpanOrQ(Seq(
      SpanNearQ(Seq(SpanTermQ("b"), SpanTermQ("c")), 10, inOrder = true), // (1,9)
      SpanNearQ(Seq(SpanTermQ("e"), SpanTermQ("f")), 0, inOrder = true))) // (2,4)
    assert(Spans.eval(inner, posOf).toSeq === Seq((1, 9), (2, 4)))
    // chain a(0,1) → inner(2,4) → g(5,6): total gap (2-1)+(5-4) = 2
    val q = SpanNearQ(Seq(SpanTermQ("a"), inner, SpanTermQ("g")), 2, inOrder = true)
    assert(Spans.eval(q, posOf).toSeq === Seq((0, 6)))
    // slop 1 < the minimal achievable gap 2 → no match
    val tight = SpanNearQ(Seq(SpanTermQ("a"), inner, SpanTermQ("g")), 1, inOrder = true)
    assert(Spans.eval(tight, posOf).isEmpty)
  }

  test("spanPositionRange: window filter; spanFirst is its start=0 case") {
    val alpha = SpanTermQ("alpha")
    // alpha positions: doc0 {0,3}, doc1 {1}, doc2 {2} — window [2,5)
    val r = counts(SpanPositionRangeQ(alpha, 2, 5))
    assert(r === Map(0L -> 1, 2L -> 1))
    for (n <- Seq(2, 4))
      assert(counts(SpanFirstQ(alpha, n)) === counts(SpanPositionRangeQ(alpha, 0, n)))
  }

  test("spanMultiTerm: wildcard inside span algebra expands via the dictionary") {
    val viaWrapper = counts(SpanNearQ(
      Seq(SpanMultiTermQ(PrefixQ("alph")), SpanTermQ("beta")), 1, inOrder = true))
    val viaTerm = counts(SpanNearQ(
      Seq(SpanTermQ("alpha"), SpanTermQ("beta")), 1, inOrder = true))
    assert(viaWrapper === viaTerm)
    assert(viaWrapper.nonEmpty)
  }
}
