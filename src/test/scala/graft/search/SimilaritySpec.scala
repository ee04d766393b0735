package graft.search

import graft.SparkTestSession
import graft.bm25.{BM25, TfIdf}
import graft.build.IndexBuilder
import graft.corpus.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

/** Pluggable Similarity on the generic path: BM25 via searchWith equals
  * the specialized WAND path bit-for-bit; TF-IDF reproduces the
  * reference's DefaultSimilarity semantics (queryNorm coupling across
  * clauses, coord = matched/total) on the TestTermScorer fixture. */
class SimilaritySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val (searcher, avgdl) = {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-sim-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dir, 2)
    val r = new IndexReader(spark, dir)
    (new Searcher(r),
      BM25.avgFieldLength(r.collectionStats.sumTotalTermFreq, r.collectionStats.maxDoc))
  }

  test("searchWith(BM25Similarity) == the specialized search path, exactly") {
    val sim = new BM25Similarity(avgdl)
    for (q <- Seq[Query](TermQ("all"), TermQ("dogs"),
      BoolQ(should = Seq(TermQ("all"), TermQ("dogs"))),
      BoolQ(must = Seq(TermQ("dogs"))))) {
      assert(searcher.searchWith(sim, q, 10).toSeq === searcher.search(q, 10).toSeq,
        s"mismatch for $q")
    }
  }

  test("searchWith(TfIdfSimilarity): single term reproduces the 1.6931472f golden") {
    val hits = searcher.searchWith(new TfIdfSimilarity, TermQ("all"), 10)
    assert(hits.map(_.docId).toSeq === Seq(0L, 5L))
    assert(hits(0).score === 1.6931472f)
    assert(hits(0).score === hits(1).score)
  }

  test("LM-Dirichlet: ranks by query likelihood, matches the closed form") {
    val hits = searcher.searchWith(new LMDirichletSimilarity(), TermQ("dogs"), 10)
    assert(hits.map(_.docId).toSeq === Seq(1L))
    // closed form: p(dogs|C) = 2/7, dl decoded from norm byte for dl=2
    val p = (2000f * (2L / 7L.toDouble)).toFloat
    val dl = BM25.NormTable(BM25.encodeNorm(2) & 0xff)
    val expected = (math.log(1 + 2f / p) + math.log(2000f / (dl + 2000f))).toFloat
    assert(hits(0).score === expected)
    // a corpus-dominant term scores near zero (log(1+tf/(mu p)) small)
    val common = searcher.searchWith(new LMDirichletSimilarity(), TermQ("all"), 10)
    assert(common.forall(_.score >= 0f))
  }

  test("TF-IDF boolean: queryNorm couples clauses, coord penalizes partial matches") {
    val hits = searcher.searchWith(new TfIdfSimilarity,
      BoolQ(should = Seq(TermQ("all"), TermQ("dogs"))), 10)
    // expected by hand: idf over df(all)=2, df(dogs)=1, maxDoc=6
    val idfA = TfIdf.idf(2, 6)
    val idfD = TfIdf.idf(1, 6)
    val ssw = idfA * idfA + idfD * idfD
    val qn = TfIdf.queryNorm(ssw)
    val wA = idfA * qn * idfA
    val wD = idfD * qn * idfD
    // doc1 "dogs dogs": matches 1 of 2 clauses -> coord 1/2
    val d1 = TfIdf.score(2f, BM25.encodeNorm(2), wD) * (1f / 2)
    // doc0 "all": coord 1/2
    val d0 = TfIdf.score(1f, BM25.encodeNorm(1), wA) * (1f / 2)
    val byDoc = hits.map(h => h.docId -> h.score).toMap
    assert(byDoc(1L) === d1)
    assert(byDoc(0L) === d0)
    assert(byDoc.keySet === Set(0L, 1L, 5L))
  }
}
