package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import graft.search.{IndexReader, Searcher, TermQ}
import org.scalatest.funsuite.AnyFunSuite

/** Tombstone deletes (liveDocs analog) + expunge (SegmentMerger/DocMap
  * analog): deleted docs vanish from results immediately while stats stay
  * put (reference semantics); expunge rewrites a dense index whose stats
  * equal a fresh build without those docs. */
class DeletesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("tombstones hide docs from search; expunge == fresh build without them") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-del-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dir, 2)

    // doc0 and doc5 both contain "all"
    val before = new Searcher(new IndexReader(spark, dir)).search(TermQ("all"), 10)
    assert(before.map(_.docId).toSeq === Seq(0L, 5L))

    Deletes.deleteDocs(spark, dir, spark.createDataset(Seq(0L)))
    val after = new Searcher(new IndexReader(spark, dir))
    assert(after.search(TermQ("all"), 10).map(_.docId).toSeq === Seq(5L))
    // stats unchanged until merge: df("all") still 2, same score as before
    assert(after.search(TermQ("all"), 10).head.score === before.head.score)
    // delete-by-term tombstones every doc containing the term; a NEW
    // searcher sees it (point-in-time reader semantics — an existing
    // searcher keeps its snapshot, like the reference's IndexReader)
    Deletes.deleteByTerm(spark, dir, "dogs")
    val after2 = new Searcher(new IndexReader(spark, dir))
    assert(after2.search(TermQ("dogs"), 10).isEmpty)

    // expunge: dense ids, stats == fresh 4-doc build
    val expunged = SparkTestSession.tmpDir("graft-del-exp-")
    Deletes.expunge(spark, dir, expunged, numPartitions = 2)
    val report = CheckIndex.check(spark, expunged)
    assert(report.ok, report.problems.mkString("; "))

    val keptCorpus = CorpusGen.microFixture.zipWithIndex
      .collect { case (f, i) if i != 0 && i != 1 => f } // doc0 deleted, doc1 had "dogs"
    val freshDir = SparkTestSession.tmpDir("graft-del-fresh-")
    IndexBuilder.build(spark, spark.createDataset(keptCorpus), freshDir, 2)
    val csE = spark.read.parquet(IndexPaths.collectionStats(expunged))
      .as[CollectionStatsRow].head()
    val csF = spark.read.parquet(IndexPaths.collectionStats(freshDir))
      .as[CollectionStatsRow].head()
    assert(csE === csF)
    // and the expunged index scores like the fresh one (same stats now)
    val se = new Searcher(new IndexReader(spark, expunged)).search(TermQ("all"), 10)
    val sf = new Searcher(new IndexReader(spark, freshDir)).search(TermQ("all"), 10)
    assert(se.map(_.score).toSeq === sf.map(_.score).toSeq)
    assert(se.length === 1)
  }

  test("expunge is fully distributed: multi-partition index, broadcast joins disabled") {
    import spark.implicits._
    // 700 docs / 4 partitions; delete every 7th doc; run expunge with
    // auto-broadcast OFF so every remap join must work as a shuffle join —
    // the DocMap is a table, not a driver-side map
    val corpus = CorpusGen.dataset(spark, 700, 4)
    val dir = SparkTestSession.tmpDir("graft-del-big-")
    IndexBuilder.build(spark, corpus, dir, numPartitions = 4)
    val dead = spark.range(0, 700, 7).map(_.toLong)
    Deletes.deleteDocs(spark, dir, dead)

    val expunged = SparkTestSession.tmpDir("graft-del-big-exp-")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try Deletes.expunge(spark, dir, expunged, numPartitions = 4)
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    val report = CheckIndex.check(spark, expunged)
    assert(report.ok, report.problems.mkString("; "))
    val cs = spark.read.parquet(IndexPaths.collectionStats(expunged))
      .as[CollectionStatsRow].head()
    assert(cs.maxDoc === 600)
    // renumbering preserves corpus order: fresh build of the survivors
    // (docId = rank in (repo, path, commit) sort order) must score and
    // rank identically
    val sortedFiles = CorpusGen.local(700).sortBy(f => (f.repo, f.path, f.commit))
    val keptCorpus = spark.createDataset(
      sortedFiles.zipWithIndex.collect { case (f, i) if i % 7 != 0 => f })
    val freshDir = SparkTestSession.tmpDir("graft-del-big-fresh-")
    IndexBuilder.build(spark, keptCorpus, freshDir, numPartitions = 4)
    val se = new Searcher(new IndexReader(spark, expunged)).search(TermQ("def"), 25)
    val sf = new Searcher(new IndexReader(spark, freshDir)).search(TermQ("def"), 25)
    assert(se.map(h => (h.docId, h.score)).toSeq === sf.map(h => (h.docId, h.score)).toSeq)
  }

  test("deleteMatching: delete-by-query tombstones every live match, incl. multi-term") {
    import spark.implicits._
    import graft.search.PrefixQ
    val dir = SparkTestSession.tmpDir("graft-delq-")
    // docs: all(0), dogs dogs(1), like(2), playing(3), fetch(4), all(5)
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dir, 2)
    // multi-term delete: prefix expands through the dictionary seek
    new Searcher(new IndexReader(spark, dir)).deleteMatching(PrefixQ("pla"))
    val s1 = new Searcher(new IndexReader(spark, dir))
    assert(s1.search(TermQ("playing"), 10).isEmpty)
    assert(s1.search(TermQ("all"), 10).map(_.docId).toSeq === Seq(0L, 5L))
    // delete-by-term-query only tombstones LIVE matches: doc0 is already
    // gone when the second delete runs, so exactly one new tombstone lands
    Deletes.deleteDocs(spark, dir, spark.createDataset(Seq(0L)))
    new Searcher(new IndexReader(spark, dir)).deleteMatching(TermQ("all"))
    assert(Deletes.tombstones(spark, dir).collect().sorted.toSeq === Seq(0L, 3L, 5L))
    assert(new Searcher(new IndexReader(spark, dir)).search(TermQ("all"), 10).isEmpty)
  }
}
