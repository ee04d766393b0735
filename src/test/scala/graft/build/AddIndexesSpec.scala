package graft.build

import graft.SparkTestSession
import graft.corpus.{CorpusGen, SourceFile}
import graft.postings.PostingsCodec
import graft.search.{IndexReader, Searcher}
import org.scalatest.funsuite.AnyFunSuite

/** IndexWriter.AddIndexes analog: two INDEPENDENTLY built indexes (docIds
  * both starting at 0) merge into one standalone index that must be
  * indistinguishable from a fresh build over the concatenated corpus —
  * stats, dictionary, postings, positions-dependent queries; deletes fold
  * during the merge. */
class AddIndexesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def mk(path: String, text: String) =
    SourceFile("r", path, "0" * 40, "txt", text, CorpusGen.sha256Hex(text))

  // f* sorts before g*, so fresh(A ++ B) assigns docIds in A-then-B order
  private val corpusA = Seq(
    mk("f0", "merge table scan fast"),
    mk("f1", "table hash join merge table"),
    mk("f2", "vector index build"))
  private val corpusB = Seq(
    mk("g0", "merge table hash probe"),
    mk("g1", "slow scan vector merge"))

  private def build(fixture: Seq[SourceFile]): String = {
    import spark.implicits._
    val d = SparkTestSession.tmpDir("graft-addidx-")
    IndexBuilder.build(spark, spark.createDataset(fixture), d, numPartitions = 2,
      analyzerFor = _ => graft.analysis.Analyzer.noStop,
      indexPositions = true, indexOffsets = true)
    d
  }

  private def dictRows(dir: String): Set[(String, Long, Long)] = {
    import spark.implicits._
    spark.read.parquet(IndexPaths.termDict(dir))
      .select($"term", $"df", $"totalTf").as[(String, Long, Long)]
      .collect().toSet
  }

  private def postingRows(dir: String): Set[(String, Long, Int, Int)] = {
    import spark.implicits._
    spark.read.parquet(IndexPaths.postings(dir))
      .select($"term", $"firstDocId", $"numDocs", $"bytes")
      .as[(String, Long, Int, Array[Byte])]
      .flatMap { case (term, first, n, bytes) =>
        val (ids, tfs, norms) = PostingsCodec.decodeBlock(first, n, bytes)
        ids.indices.iterator.map(i => (term, ids(i), tfs(i), norms(i)))
      }.collect().toSet
  }

  test("addIndexes(A, B) == fresh build over A ++ B, bit for bit") {
    import spark.implicits._
    val dirA = build(corpusA)
    val dirB = build(corpusB)
    val merged = SparkTestSession.tmpDir("graft-addidx-out-")
    AddIndexes.addIndexes(spark, Seq(dirA, dirB), merged, numPartitions = 2)
    val fresh = build(corpusA ++ corpusB)

    assert(CheckIndex.check(spark, merged).ok)
    val csM = spark.read.parquet(IndexPaths.collectionStats(merged))
      .as[CollectionStatsRow].head()
    val csF = spark.read.parquet(IndexPaths.collectionStats(fresh))
      .as[CollectionStatsRow].head()
    assert(csM === csF)
    assert(dictRows(merged) === dictRows(fresh))
    assert(postingRows(merged) === postingRows(fresh))

    // positions survive aligned: exact-phrase matching through the merged
    // index equals the fresh build (same docIds, same freqs)
    def phrase(dir: String) = new Searcher(new IndexReader(spark, dir),
      analyzerFor = _ => graft.analysis.Analyzer.noStop)
      .phraseFreqs(Seq("merge", "table")).collect().toSet
    assert(phrase(merged) === phrase(fresh))
    assert(phrase(merged).map(_._1) === Set(0L, 1L, 3L)) // f0, f1, g0
  }

  test("deletes fold during the merge; renumber stays dense in input order") {
    import spark.implicits._
    val dirA = build(corpusA)
    val dirB = build(corpusB)
    Deletes.deleteDocs(spark, dirA, spark.createDataset(Seq(1L))) // drop f1
    val merged = SparkTestSession.tmpDir("graft-addidx-del-")
    AddIndexes.addIndexes(spark, Seq(dirA, dirB), merged, numPartitions = 2)
    val fresh = build((corpusA.patch(1, Nil, 1)) ++ corpusB)

    assert(CheckIndex.check(spark, merged).ok)
    assert(dictRows(merged) === dictRows(fresh))
    assert(postingRows(merged) === postingRows(fresh))
  }

  test("mixing sidecar levels is rejected up front") {
    import spark.implicits._
    val dirA = build(corpusA) // positions + offsets
    val plain = SparkTestSession.tmpDir("graft-addidx-plain-")
    IndexBuilder.build(spark, spark.createDataset(corpusB), plain,
      numPartitions = 2, analyzerFor = _ => graft.analysis.Analyzer.noStop)
    val out = SparkTestSession.tmpDir("graft-addidx-bad-")
    intercept[IllegalArgumentException] {
      AddIndexes.addIndexes(spark, Seq(dirA, plain), out, numPartitions = 2)
    }
  }
}
