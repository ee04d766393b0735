package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import graft.search.{IndexReader, Searcher, TermQ, BoolQ}
import org.scalatest.funsuite.AnyFunSuite

/** MultiPassIndexSplitter / PKIndexSplitter analog: N contiguous-range
  * shards, original docIds preserved, so the union view over the shards
  * must answer EXACTLY like the unsplit index — scores bit-for-bit (the
  * re-aggregated dictionary/stats sums equal the originals). */
class IndexSplitterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("3-way split: shards valid, sizes partition the corpus, union search == original") {
    import spark.implicits._
    val corpus = CorpusGen.dataset(spark, 700, 4)
    val dir = SparkTestSession.tmpDir("graft-split-src-")
    IndexBuilder.build(spark, corpus, dir, numPartitions = 4)

    val root = SparkTestSession.tmpDir("graft-split-out-")
    val shards = IndexSplitter.split(spark, dir, root, numShards = 3, numPartitions = 2)
    assert(shards.size === 3)

    // each shard is a self-contained valid index
    shards.foreach { sd =>
      val report = CheckIndex.check(spark, sd)
      assert(report.ok, s"$sd: ${report.problems.mkString("; ")}")
    }
    // shard docId ranges partition [0, 700) disjointly and completely
    val counts = shards.map(sd =>
      spark.read.parquet(IndexPaths.docstats(sd)).count())
    assert(counts.sum === 700L)
    val idSets = shards.map(sd =>
      spark.read.parquet(IndexPaths.docstats(sd))
        .select("docId").as[Long].collect().toSet)
    assert(idSets.reduce(_ ++ _).size === 700)
    assert(idSets.combinations(2).forall { case Seq(a, b) => (a & b).isEmpty })

    // union view == original index, scores bit-for-bit
    val whole = new Searcher(new IndexReader(spark, dir))
    val union = new Searcher(IndexReader.multi(spark, shards))
    val q = BoolQ(must = Seq(TermQ("def")), should = Seq(TermQ("three")))
    val a = whole.search(q, 25)
    val b = union.search(q, 25)
    assert(a.map(h => (h.docId, h.score)).toSeq === b.map(h => (h.docId, h.score)).toSeq)
    assert(a.nonEmpty)
  }

  test("split folds tombstones like a merge") {
    import spark.implicits._
    val corpus = CorpusGen.dataset(spark, 120, 2)
    val dir = SparkTestSession.tmpDir("graft-split-del-")
    IndexBuilder.build(spark, corpus, dir, numPartitions = 2)
    Deletes.deleteDocs(spark, dir, spark.createDataset(Seq(3L, 60L, 119L)))

    val root = SparkTestSession.tmpDir("graft-split-del-out-")
    val shards = IndexSplitter.split(spark, dir, root, numShards = 2, numPartitions = 2)
    val ids = shards.flatMap(sd =>
      spark.read.parquet(IndexPaths.docstats(sd)).select("docId").as[Long].collect())
    assert(ids.size === 117 && !ids.exists(Set(3L, 60L, 119L)))
  }
}
