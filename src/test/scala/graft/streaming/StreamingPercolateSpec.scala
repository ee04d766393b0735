package graft.streaming

import graft.SparkTestSession
import graft.search._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming percolation: stored queries (incl. phrases and booleans)
  * fire alerts per arriving micro-batch; the stream result equals the
  * batch memoryPercolate over the same docs; non-matching docs fire
  * nothing. */
class StreamingPercolateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val stored: Seq[(Long, Query)] = Seq(
    1L -> TermQ("spark"),
    2L -> PhraseQ(Seq("inverted", "index")),
    3L -> BoolQ(must = Seq(TermQ("fox"), TermQ("dog"))),
    4L -> BoolQ(must = Seq(TermQ("fox")), mustNot = Seq(TermQ("dog"))))

  private val batch1 = Seq(
    StreamDoc(0L, "spark builds an inverted index from postings"),
    StreamDoc(1L, "the quick brown fox jumps over the lazy dog"))
  private val batch2 = Seq(
    StreamDoc(2L, "a fox without its usual companion"),
    StreamDoc(3L, "nothing relevant here at all"))

  test("alerts fire per micro-batch and equal the batch percolation") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = StreamingPercolate.alerts(mem.toDS(), stored)
      .writeStream.format("memory").queryName("perc_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(batch1)
    q.processAllAvailable()
    val afterB1 = spark.table("perc_out").as[(Long, Long)].collect().toSet
    assert(afterB1 === Set((1L, 0L), (2L, 0L), (3L, 1L)),
      "batch1: doc0 hits term+phrase, doc1 hits the conjunction; mustNot blocks q4")
    mem.addData(batch2)
    q.processAllAvailable()
    q.stop()
    val all = spark.table("perc_out").as[(Long, Long)].collect().toSet
    assert(all === afterB1 ++ Set((4L, 2L)),
      "batch2: fox-without-dog fires q4 only; doc3 fires nothing")

    // stream ≡ batch: same function of the same rows
    val batch = Percolate.memoryPercolate(
      (batch1 ++ batch2).toDF("doc_id", "text"), stored,
      graft.analysis.Analyzer.standard)
      .as[(Long, Long)].collect().toSet
    assert(batch === all)
  }
}
