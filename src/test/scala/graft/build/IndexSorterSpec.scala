package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import graft.search.{IndexReader, Searcher, TermQ}
import org.scalatest.funsuite.AnyFunSuite

/** SortingMergePolicy / EarlyTerminatingSortingCollector analog: the
  * sorted rewrite preserves content and stats (scores identical per doc,
  * ids permuted into sort order), and early top-k decodes only the
  * leading blocks yet equals the full sort. */
class IndexSorterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("sortBy(tokenCount): valid index, ids in sort order, scores preserved per path") {
    import spark.implicits._
    val corpus = CorpusGen.dataset(spark, 500, 4)
    val dir = SparkTestSession.tmpDir("graft-sort-src-")
    IndexBuilder.build(spark, corpus, dir, numPartitions = 4)
    val out = SparkTestSession.tmpDir("graft-sort-out-")
    IndexSorter.sortBy(spark, dir, out, "tokenCount", numPartitions = 4)

    val report = CheckIndex.check(spark, out)
    assert(report.ok, report.problems.mkString("; "))

    // docIds ascend with (tokenCount, old order): adjacent ids never
    // decrease in tokenCount
    val stats = spark.read.parquet(IndexPaths.docstats(out))
      .select("docId", "tokenCount").as[(Long, Int)].collect().sortBy(_._1)
    assert(stats.map(_._1).toSeq === (0L until 500L))
    assert(stats.sliding(2).forall { case Array(a, b) => a._2 <= b._2; case _ => true })

    // same corpus, same stats → same scores; per-path hit sets identical
    def byPath(d: String) = {
      val s = new Searcher(new IndexReader(spark, d)).search(TermQ("def"), 600)
      val docs = DocsTable.read(spark, d).select("docId", "path")
        .as[(Long, String)].collect().toMap
      s.map(h => docs(h.docId) -> h.score).toMap
    }
    assert(byPath(dir) === byPath(out))
  }

  test("earlyTopK: equals the full ascending scan, decodes only leading blocks") {
    import spark.implicits._
    val corpus = CorpusGen.dataset(spark, 700, 4)
    val dir = SparkTestSession.tmpDir("graft-sort2-src-")
    IndexBuilder.build(spark, corpus, dir, numPartitions = 4)
    val out = SparkTestSession.tmpDir("graft-sort2-out-")
    IndexSorter.sortBy(spark, dir, out, "tokenCount", numPartitions = 4)

    val k = 20
    val early = IndexSorter.earlyTopK(spark, out, "def", k)
      .select("docId").as[Long].collect().toSeq
    val full = {
      spark.read.parquet(IndexPaths.postings(out)).where($"term" === "def")
        .select($"term", $"firstDocId", $"lastDocId", $"numDocs", $"maxTf",
          $"maxNorm", $"sumTf", $"segId", $"bytes").as[PostingRow]
        .flatMap { pr =>
          val (ids, _, _) = graft.postings.PostingsCodec.decodeBlock(pr.firstDocId, pr.numDocs, pr.bytes)
          ids.toSeq
        }.collect().sorted.take(k).toSeq
    }
    assert(early === full)
    // 'def' hits most docs (~700 ⇒ ≥5 blocks of 128); k=20 needs just one
    val blocks = spark.read.parquet(IndexPaths.postings(out))
      .where($"term" === "def").count()
    assert(blocks >= 5, s"fixture too small: $blocks blocks")
    val kept = spark.read.parquet(IndexPaths.postings(out))
      .where($"term" === "def").select($"firstDocId", $"numDocs")
      .as[(Long, Int)].collect().sortBy(_._1)
    var need = k
    val decoded = kept.takeWhile { case (_, n) => val t = need > 0; need -= n; t }
    assert(decoded.length < blocks, "early termination decoded every block")

    // regression: deletes AFTER the sorted rewrite — tombstoned docs must
    // neither surface nor consume the k budget (the reference collector
    // only ever sees liveDocs)
    val deadIds = full.take(5)
    Deletes.deleteDocs(spark, out, spark.createDataset(deadIds))
    val liveEarly = IndexSorter.earlyTopK(spark, out, "def", k)
      .select("docId").as[Long].collect().toSeq
    val liveFull = {
      spark.read.parquet(IndexPaths.postings(out)).where($"term" === "def")
        .select($"term", $"firstDocId", $"lastDocId", $"numDocs", $"maxTf",
          $"maxNorm", $"sumTf", $"segId", $"bytes").as[PostingRow]
        .flatMap { pr =>
          val (ids, _, _) = graft.postings.PostingsCodec.decodeBlock(pr.firstDocId, pr.numDocs, pr.bytes)
          ids.toSeq
        }.collect().sorted.filterNot(deadIds.contains).take(k).toSeq
    }
    assert(liveEarly === liveFull)
    assert(liveEarly.size === k && deadIds.forall(d => !liveEarly.contains(d)))
  }
}
