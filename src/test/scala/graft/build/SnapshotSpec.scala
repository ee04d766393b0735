package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import graft.search.{IndexReader, Searcher, TermQ}
import org.scalatest.funsuite.AnyFunSuite

/** SnapshotDeletionPolicy analog: a pinned commit point keeps its liveDocs
  * and docvalue state while the live index moves on; snapshots are
  * metadata-sized and releasable. */
class SnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("snapshot pins liveDocs: later deletes are invisible at the pin") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-snap-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dir, 2)

    val snap0 = Snapshots.create(spark, dir)
    Deletes.deleteDocs(spark, dir, spark.createDataset(Seq(0L)))
    val snap1 = Snapshots.create(spark, dir)

    def ids(r: IndexReader): Seq[Long] =
      new Searcher(r).search(TermQ("all"), 10).map(_.docId).toSeq

    assert(ids(new IndexReader(spark, dir)) === Seq(5L), "live sees the delete")
    assert(ids(IndexReader.atSnapshot(spark, dir, snap0)) === Seq(0L, 5L),
      "the pre-delete pin still sees doc 0")
    assert(ids(IndexReader.atSnapshot(spark, dir, snap1)) === Seq(5L),
      "the post-delete pin captured the tombstone")
    assert(Snapshots.list(spark, dir) === Seq(snap0, snap1))

    Snapshots.release(spark, dir, snap0)
    assert(Snapshots.list(spark, dir) === Seq(snap1))
  }

  test("snapshot pins docvalue updates at the gen watermark") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-snap-dv-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dir, 2)

    DocValues.update(spark, dir,
      Seq((0L, "lang", "scala")).toDF("docId", "field", "value"))
    val snap = Snapshots.create(spark, dir)
    DocValues.update(spark, dir,
      Seq((0L, "lang", "rust")).toDF("docId", "field", "value"))

    def langOf(df: org.apache.spark.sql.DataFrame): String =
      df.where($"docId" === 0L).select($"lang").head().getString(0)

    assert(langOf(DocValues.readDocstats(spark, dir)) === "rust", "live = last writer")
    assert(langOf(Snapshots.docstatsAt(spark, dir, snap)) === "scala",
      "the pin resolves updates at its watermark")
  }
}
