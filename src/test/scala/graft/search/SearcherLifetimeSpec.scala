package graft.search

import graft.SparkTestSession
import graft.build.IndexBuilder
import graft.corpus.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

/** SearcherLifetimeManager: acquired views stay pinned across index
  * mutation; PruneByAge keeps the newest regardless of age. */
class SearcherLifetimeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("record/acquire pins the view; prune-by-age keeps the newest") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-slm-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.local(20)), dir, 2)
    val mgr = new SearcherLifetime(spark, dir)

    val q = TermQ("zero") // exactly one doc spells a 0 within 20 docs
    val target = new Searcher(new IndexReader(spark, dir)).search(q, 5)
    assert(target.length == 1)

    val t0 = mgr.record(nowMs = 1000L)
    // the index moves on: delete the matching doc AFTER the session started
    graft.build.Deletes.deleteDocs(spark, dir,
      spark.createDataset(Seq(target.head.docId)))
    val t1 = mgr.record(nowMs = 5000L)

    val s0 = new Searcher(mgr.acquire(t0).get)
    val s1 = new Searcher(mgr.acquire(t1).get)
    assert(s0.search(q, 5).nonEmpty, "pinned session still sees doc 0")
    assert(s1.search(q, 5).isEmpty, "new session sees the delete")

    // prune at 10s with maxAge 3s: t0 (age 9s) dies, t1 (age 5s > 3s)
    // survives as the newest
    val dead = mgr.prune(maxAgeSec = 3.0, nowMs = 10000L)
    assert(dead == Seq(t0))
    assert(mgr.acquire(t0).isEmpty && mgr.acquire(t1).isDefined)
    assert(mgr.recorded == Seq(t1))
    mgr.release(t1)
    assert(mgr.acquire(t1).isEmpty)
  }
}
