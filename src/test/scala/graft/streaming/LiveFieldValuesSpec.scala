package graft.streaming

import graft.SparkTestSession
import graft.corpus.CorpusGen
import org.scalatest.funsuite.AnyFunSuite

/** LiveFieldValues analog: last-writer-wins per primary key across
  * generations, deletes respected — the reference's get(id)-before-
  * refresh contract (Search/LiveFieldValues.cs). */
class LiveFieldValuesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("latest generation's value wins; tombstoned versions invisible") {
    import spark.implicits._
    def mk(path: String, commit: String, text: String) = graft.corpus.SourceFile(
      "r", path, commit, "txt", text, CorpusGen.sha256Hex(text))
    val root = SparkTestSession.tmpDir("graft-lfv-")
    StreamingIndexer.appendBatch(spark, spark.createDataset(Seq(
      mk("a", "c1", "one"), mk("b", "c1", "two"))), root, 0, numPartitions = 2)
    StreamingIndexer.updateDocuments(spark, spark.createDataset(Seq(
      mk("a", "c2", "one updated"))), root, 1, numPartitions = 2)
    StreamingIndexer.updateDocuments(spark, spark.createDataset(Seq(
      mk("a", "c3", "one updated again"), mk("c", "c1", "three"))),
      root, 2, numPartitions = 2)

    val live = StreamingIndexer.liveFieldValues(spark, root, "commit")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(live == Map("a" -> "c3", "b" -> "c1", "c" -> "c1"))

    // a different field reads through the same path
    val texts = StreamingIndexer.liveFieldValues(spark, root, "content")
      .collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(texts("a") == "one updated again" && texts("b") == "two")
  }
}
