package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

/** BloomFilteringPostingsFormat analog: zero false negatives over the
  * whole dictionary, low false-positive rate on absent terms, and the
  * probe touches only k pushed point reads. */
class BloomFilterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("no false negatives; FPP small; probes are point reads") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-bloom-")
    IndexBuilder.build(spark, CorpusGen.dataset(spark, 300, 2), dir, 2)
    BloomFilter.build(spark, dir)

    val terms = spark.read.parquet(IndexPaths.termDict(dir))
      .select("term").as[String].collect()
    assert(terms.length > 100)
    // EVERY indexed term must probe positive (false negative = broken)
    terms.foreach { t =>
      assert(BloomFilter.mightContain(spark, dir, t), s"false negative: $t")
    }
    // absent terms: mostly negative (bitsPerKey=10, k=7 → ~1% theoretical;
    // allow generous slack on a small filter)
    val absent = (0 until 200).map(i => s"zz_absent_token_$i")
    val fp = absent.count(t => BloomFilter.mightContain(spark, dir, t))
    assert(fp <= 10, s"false-positive rate too high: $fp/200")

    // geometry: word table is dense and sorted; word count is a power of 2
    val words = spark.read.parquet(BloomFilter.path(dir))
    val m = words.select("m").head().getLong(0)
    assert((m & (m - 1)) === 0L)
    assert(words.count() <= m / 64)
  }

  test("searcher short-circuit: results identical with the sidecar, misses skip the dictionary") {
    import graft.search.{BoolQ, IndexReader, Searcher, TermQ}
    val dir = SparkTestSession.tmpDir("graft-bloom-search-")
    IndexBuilder.build(spark, CorpusGen.dataset(spark, 200, 2), dir, 2)
    val before = new Searcher(new IndexReader(spark, dir))
      .search(BoolQ(should = Seq(TermQ("def"), TermQ("zz_never_indexed"))), 10)
    BloomFilter.build(spark, dir)
    val reader = new IndexReader(spark, dir)
    val after = new Searcher(reader).search(
      BoolQ(should = Seq(TermQ("def"), TermQ("zz_never_indexed"))), 10)
    assert(after.map(h => (h.docId, h.score)).toSeq ===
      before.map(h => (h.docId, h.score)).toSeq)
    // the absent term is dropped before the dictionary lookup
    assert(reader.termStats(Seq("zz_never_indexed")).isEmpty)
    assert(reader.termStats(Seq("def")).contains("def"))
  }
}
