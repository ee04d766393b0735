package graft.bm25

import graft.SparkTestSession
import graft.build.{IndexBuilder, IndexPaths}
import graft.corpus.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

/** Reproduce the reference's OWN exact-score golden under
  * DefaultSimilarity on its own fixture corpus (reference:
  * /root/reference/src/Lucene.Net.Tests/Search/TestTermScorer.cs:44-105 —
  * Values = {"all","dogs dogs","like","playing","fetch","all"};
  * doc0.Score == doc5.Score == 1.6931472f), scoring straight from the
  * engine's index tables — the stored norm byte and dictionary stats feed
  * either similarity (pluggable-Similarity contract). */
class TfIdfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("TestTermScorer golden: score('all') == 1.6931472f from index tables") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-tfidf-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dir, 2)

    val cs = spark.read.parquet(IndexPaths.collectionStats(dir))
      .as[graft.build.CollectionStatsRow].head()
    val dict = spark.read.parquet(IndexPaths.termDict(dir))
      .where($"term" === "all").as[graft.build.TermDictRow].head()
    val norms = spark.read.parquet(IndexPaths.docstats(dir))
      .select($"docId", $"norm").as[(Long, Int)].collect().toMap

    val w = TfIdf.weightValue(TfIdf.idf(dict.df, cs.maxDoc), boost = 1f)
    val s0 = TfIdf.score(1f, norms(0L).toByte, w)
    val s5 = TfIdf.score(1f, norms(5L).toByte, w)
    assert(s0 === s5)
    assert(s0 === 1.6931472f) // the reference's literal golden
  }

  test("tf saturation is sqrt under TF-IDF (doc 'dogs dogs')") {
    // idf(df=1, maxDoc=6) = ln(6/2)+1; norm byte for dl=2
    val w = TfIdf.weightValue(TfIdf.idf(1, 6), 1f)
    val normB = BM25.encodeNorm(2)
    val s = TfIdf.score(2f, normB, w)
    val expected = (math.sqrt(2.0).toFloat) * w * TfIdf.NormTable(normB & 0xff)
    assert(s === expected)
    assert(TfIdf.tf(4f) === 2f)
  }
}
