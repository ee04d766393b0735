package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import graft.search.{IndexReader, Searcher, WildcardQ}
import org.scalatest.funsuite.AnyFunSuite

/** Reversed-dictionary sidecar (the ReverseStringFilter leading-wildcard
  * idea): a `*suffix` query seeks a reversed-prefix range instead of
  * scanning the dictionary — results must be bit-identical either way. */
class ReversedDictSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("leading wildcard: seek == scan, scores bit-for-bit; sidecar mirrors the dictionary") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-revdict-")
    IndexBuilder.build(spark, CorpusGen.dataset(spark, 250, 2), dir, 2)

    val q = WildcardQ("*ee") // 'three' etc.
    val before = new Searcher(new IndexReader(spark, dir)).search(q, 50)
    assert(before.nonEmpty)

    ReversedDict.build(spark, dir, numPartitions = 2)
    val reader = new IndexReader(spark, dir)
    assert(reader.hasReversedDict)
    val after = new Searcher(reader).search(q, 50)
    assert(after.map(h => (h.docId, h.score)).toSeq ===
      before.map(h => (h.docId, h.score)).toSeq)

    // the sidecar is a faithful mirror: reversing rterm gives term, and
    // the row set equals the forward dictionary's
    val rev = spark.read.parquet(IndexPaths.termDictRev(dir))
      .select("rterm", "term").as[(String, String)].collect()
    assert(rev.forall { case (r, t) => graft.analysis.TokenFilters.reverse(r) == t })
    val fwd = spark.read.parquet(IndexPaths.termDict(dir))
      .select("term").as[String].collect().toSet
    assert(rev.map(_._2).toSet == fwd)

    // the expansion really is a seek: the suffix probe expands exactly
    // the terms ending in the suffix
    val exp = reader.expandSuffixOpt("ee").get.toSet
    assert(exp == fwd.filter(_.endsWith("ee")) && exp.nonEmpty)
  }
}
