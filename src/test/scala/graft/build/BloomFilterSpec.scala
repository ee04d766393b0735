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
}
