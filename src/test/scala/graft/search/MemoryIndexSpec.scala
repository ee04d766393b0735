package graft.search

import graft.SparkTestSession
import graft.analysis.Analyzer
import org.scalatest.funsuite.AnyFunSuite

/** Single-document MemoryIndex (reference: Lucene.Net.Memory/
  * MemoryIndex.cs) — full Query ADT evaluation against one analyzed
  * document, consistency with the distributed Searcher's kernels, and
  * the map-only percolation path built on it. */
class MemoryIndexSpec extends AnyFunSuite {

  private val an = Analyzer.noStop
  //                 0     1    2     3     4     5
  private val text = "alpha beta gamma alpha delta beta"
  private lazy val mi = MemoryIndex.fromText(text, an)

  test("term stats: tf, positions, docLen, sorted dictionary") {
    assert(mi.tf("alpha") == 2)
    assert(mi.posOf("beta").toSeq == Seq(1, 5))
    assert(mi.tf("nope") == 0)
    assert(mi.docLen == 6)
    assert(mi.sortedTerms.toSeq == Seq("alpha", "beta", "delta", "gamma"))
  }

  test("term and boolean matching") {
    assert(mi.matches(TermQ("alpha")))
    assert(!mi.matches(TermQ("omega")))
    assert(mi.matches(BoolQ(must = Seq(TermQ("alpha"), TermQ("beta")))))
    assert(!mi.matches(BoolQ(must = Seq(TermQ("alpha")), mustNot = Seq(TermQ("beta")))))
    // pure-should needs >= 1 hit; msm raises the bar
    assert(mi.matches(BoolQ(should = Seq(TermQ("omega"), TermQ("beta")))))
    assert(!mi.matches(BoolQ(should = Seq(TermQ("omega"), TermQ("psi")))))
    assert(!mi.matches(BoolQ(should = Seq(TermQ("omega"), TermQ("beta")), minShouldMatch = 2)))
    assert(mi.matches(BoolQ(should = Seq(TermQ("alpha"), TermQ("beta")), minShouldMatch = 2)))
  }

  test("exact and sloppy phrases") {
    assert(mi.matches(PhraseQ(Seq("alpha", "beta"))))
    assert(mi.matches(PhraseQ(Seq("beta", "gamma"))))
    assert(!mi.matches(PhraseQ(Seq("beta", "alpha")))) // wrong order, slop 0
    assert(mi.matches(PhraseQ(Seq("beta", "alpha"), slop = 2))) // transposed within slop
    assert(mi.matches(PhraseQ(Seq("alpha", "gamma"), slop = 1))) // one gap
    assert(!mi.matches(PhraseQ(Seq("alpha", "omega"))))
    // phrase freq agrees with a hand count: "alpha beta" occurs once
    val s1 = mi.matchScore(PhraseQ(Seq("alpha", "beta"))).get
    val s2 = mi.matchScore(PhraseQ(Seq("gamma", "alpha"))).get
    assert(s1 == s2) // both freq=1, same length => same score
  }

  test("sparse and n-gram phrases (regression: these crashed the multi-term catch-all)") {
    // text positions: alpha(0,3) beta(1,5) gamma(2) delta(4)
    assert(mi.matches(SparsePhraseQ(Seq(("alpha", 0), ("gamma", 2))))) // gap of 1
    assert(mi.matches(SparsePhraseQ(Seq(("beta", 0), ("delta", 3)))))  // 1 → 4
    assert(!mi.matches(SparsePhraseQ(Seq(("alpha", 0), ("delta", 2)))))
    assert(!mi.matches(SparsePhraseQ(Seq(("alpha", 0), ("omega", 1)))))
    // anchor count: alpha→beta at (0,1) AND (3,5)? rel=1: 3+1=4 is delta — one anchor
    val s = mi.matchScore(SparsePhraseQ(Seq(("alpha", 0), ("beta", 1)))).get
    assert(s > 0f)
    // NGramPhraseQ delegates to its optimized rewrite, like the Searcher
    assert(mi.matches(NGramPhraseQ(2, Seq("alpha", "beta", "gamma"))))
    assert(!mi.matches(NGramPhraseQ(2, Seq("beta", "alpha", "gamma"))))
    // prescreen stays sound for both
    assert(MemoryIndex.requiredTerms(SparsePhraseQ(Seq(("alpha", 0), ("gamma", 2))))
      === Set("alpha", "gamma"))
    assert(MemoryIndex.requiredTerms(NGramPhraseQ(2, Seq("a", "b", "c")))
      === Set("a", "c")) // the optimized rewrite keeps p%2==0 and the last
  }

  test("multi-phrase slots incl. repeat groups") {
    assert(mi.matches(MultiPhraseQ(Seq(Seq("alpha", "zeta"), Seq("beta")))))
    assert(!mi.matches(MultiPhraseQ(Seq(Seq("zeta"), Seq("beta")))))
    // identical slots form a repeat group: "alpha ... alpha" needs two
    // distinct alpha positions within slop
    assert(mi.matches(MultiPhraseQ(Seq(Seq("alpha"), Seq("alpha")), slop = 2)))
  }

  test("multi-term nodes expand against the doc's own dictionary") {
    assert(mi.expandLocal(PrefixQ("al")).toSeq == Seq("alpha"))
    assert(mi.expandLocal(WildcardQ("*et*")).toSeq == Seq("beta"))
    assert(mi.expandLocal(RegexpQ("(alpha|delta)")).toSeq == Seq("alpha", "delta"))
    assert(mi.expandLocal(FuzzyQ("betta", 1)).toSeq == Seq("beta"))
    assert(mi.expandLocal(TermRangeQ("b", "d")).toSeq == Seq("beta"))
    assert(mi.matches(PrefixQ("gam")) && !mi.matches(PrefixQ("zz")))
    assert(mi.matches(ComplexPhraseQ(Seq(TermQ("alpha"), PrefixQ("bet")))))
    assert(!mi.matches(ComplexPhraseQ(Seq(TermQ("alpha"), PrefixQ("gam")))))
  }

  test("dismax, constant score, function score, boosting") {
    assert(mi.matchScore(ConstantScoreQ(TermQ("alpha"), 2.5f)).contains(2.5f))
    assert(mi.matchScore(ConstantScoreQ(TermQ("omega"), 2.5f)).isEmpty)
    assert(mi.matches(DisMaxQ(Seq(TermQ("omega"), TermQ("beta")))))
    val base = mi.matchScore(TermQ("alpha")).get
    val fs = mi.matchScore(FunctionScoreQ(TermQ("alpha"),
      ScoreExpr.Mul(ScoreExpr.SubScore, ScoreExpr.DocLen))).get
    assert(math.abs(fs - base * 6f) < 1e-6f)
    val boosted = mi.matchScore(BoostingQ(TermQ("alpha"), TermQ("beta"), 0.5f)).get
    assert(math.abs(boosted - base * 0.5f) < 1e-6f)
    // context alone never produces a hit
    assert(mi.matchScore(BoostingQ(TermQ("omega"), TermQ("beta"), 0.5f)).isEmpty)
  }

  test("span evaluation incl. SpanMultiTerm expansion") {
    assert(mi.matchesSpan(SpanNearQ(Seq(SpanTermQ("alpha"), SpanTermQ("beta")), 0, inOrder = true)))
    assert(mi.spans(SpanTermQ("alpha")).toSeq == Seq((0, 1), (3, 4)))
    assert(mi.matchesSpan(SpanMultiTermQ(PrefixQ("del"))))
    assert(!mi.matchesSpan(SpanMultiTermQ(PrefixQ("zz"))))
    assert(mi.matchesSpan(SpanFirstQ(SpanTermQ("alpha"), 1)))
    assert(!mi.matchesSpan(SpanFirstQ(SpanTermQ("delta"), 1)))
  }

  test("requiredTerms prescreen is a sound lower bound") {
    val q = BoolQ(must = Seq(TermQ("alpha"), PhraseQ(Seq("beta", "gamma"))),
      should = Seq(TermQ("whatever")))
    assert(MemoryIndex.requiredTerms(q) == Set("alpha", "beta", "gamma"))
    // disjunctive branches contribute nothing
    assert(MemoryIndex.requiredTerms(BoolQ(should = Seq(TermQ("x")))) == Set.empty[String])
    assert(MemoryIndex.requiredTerms(PrefixQ("al")) == Set.empty[String])
    // soundness: any matching doc contains every required term
    assert(MemoryIndex.requiredTerms(q).forall(mi.contains) || !mi.matches(q))
  }

  test("levenshtein helper") {
    assert(MemoryIndex.levenshtein("kitten", "sitting") == 3)
    assert(MemoryIndex.levenshtein("", "abc") == 3)
    assert(MemoryIndex.levenshtein("abc", "abc") == 0)
  }

  test("memoryPercolate: map-only full-query percolation over Spark") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "merge sort is a stable sort"),
      (1L, "quick sort beats merge sort on cache"),
      (2L, "hash join and sort merge join"),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val stored: Seq[(Long, Query)] = Seq(
      (100L, PhraseQ(Seq("merge", "sort"))),
      (101L, PhraseQ(Seq("sort", "merge"))),
      (102L, BoolQ(must = Seq(TermQ("sort")), mustNot = Seq(TermQ("hash")))),
      (103L, PrefixQ("mer")),
      (104L, SpanTermQ("x") match { case _ => MatchAllQ() })) // matches all
    val got = Percolate.memoryPercolate(docs, stored, Analyzer.sqlParity)
      .as[(Long, Long)].collect().toSet
    assert(got == Set(
      (100L, 0L), (100L, 1L), // "merge sort" verbatim
      (101L, 2L), // "sort merge"
      (102L, 0L), (102L, 1L), // sort w/o hash
      (103L, 0L), (103L, 1L), (103L, 2L), // merge*
      (104L, 0L), (104L, 1L), (104L, 2L), (104L, 3L)))
  }
}
