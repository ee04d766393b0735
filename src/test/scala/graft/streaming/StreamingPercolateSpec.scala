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

  test("join path ≡ broadcast path with broadcast joins DISABLED") {
    import spark.implicits._
    // a query with no required terms (pure disjunction over multi-term
    // leaves) exercises the unprescreenable fallback
    val withDisj = stored :+ (5L -> BoolQ(
      should = Seq(PrefixQ("compan"), TermQ("irrelevant"))))
    val docs = (batch1 ++ batch2).toDF("doc_id", "text")
    val qtab = Percolate.queryTable(spark, withDisj)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joinPath = Percolate.memoryPercolateJoin(
        docs, qtab, graft.analysis.Analyzer.standard)
        .as[(Long, Long)].collect().toSet
      val bcPath = Percolate.memoryPercolate(
        docs, withDisj, graft.analysis.Analyzer.standard)
        .as[(Long, Long)].collect().toSet
      assert(joinPath === bcPath)
      assert(joinPath.contains((5L, 2L)), "disjunction query fires via fallback")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("streaming join path (foreachBatch) fires the same alerts per batch") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val qtab = Percolate.queryTable(spark, stored)
    val mem = MemoryStream[StreamDoc]
    val got = scala.collection.mutable.Set.empty[(Long, Long)]
    val q = StreamingPercolate.alertsJoinWriter(mem.toDS(), qtab) {
      (alerts, _) => got ++= alerts.as[(Long, Long)].collect()
    }.trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(batch1)
    q.processAllAvailable()
    assert(got.toSet === Set((1L, 0L), (2L, 0L), (3L, 1L)))
    mem.addData(batch2)
    q.processAllAvailable()
    q.stop()
    assert(got.toSet === Set((1L, 0L), (2L, 0L), (3L, 1L), (4L, 2L)))
  }
}
