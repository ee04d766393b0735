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

  test("crashed create leaves no half-snapshot: staging is invisible, next create reuses the id") {
    import spark.implicits._
    val dir = SparkTestSession.tmpDir("graft-snap-crash-")
    IndexBuilder.build(spark, spark.createDataset(CorpusGen.microFixture), dir, 2)
    val s0 = Snapshots.create(spark, dir)
    // simulate a crash mid-create: a stage dir exists (tombstones, no
    // meta, no rename) — the old layout listed it and then
    // genWatermark() failed forever
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stale = new org.apache.hadoop.fs.Path(s"${Snapshots.root(dir)}/.tmp-snap-${s0 + 1}")
    fs.mkdirs(stale)
    assert(Snapshots.list(spark, dir) === Seq(s0), "staging dirs are not listed")
    val s1 = Snapshots.create(spark, dir) // must clear the leftover and commit
    assert(s1 === s0 + 1)
    assert(Snapshots.genWatermark(spark, dir, s1) === -1L, "committed snapshot is complete")
    assert(Snapshots.list(spark, dir) === Seq(s0, s1))
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
