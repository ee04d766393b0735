package graft.streaming

import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-ingest dedup: exact verdicts are immediate and stable across
  * micro-batches (a duplicate arriving later still points at the original
  * keeper); LSH candidate generation pairs new arrivals against bucket
  * history. */
class StreamingDedupSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val batch1 = Seq(
    StreamDoc(0L, "the quick brown fox jumps over the lazy dog again and again"),
    StreamDoc(1L, "spark builds inverted index postings with delta encoded blocks"))
  private val batch2 = Seq(
    StreamDoc(100L, "the quick brown fox jumps over the lazy dog again and again"),
    StreamDoc(101L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"),
    StreamDoc(102L, "zzz yyy xxx www vvv uuu ttt sss rrr qqq ppp ooo"))

  test("exact decisions: cross-batch duplicate points at the original keeper") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = StreamingDedup.decisions(mem.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(batch1)
    q.processAllAvailable()
    mem.addData(batch2)
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").as[DedupDecision]
      .collect().map(d => d.doc_id -> ((d.is_first, d.keeper))).toMap
    assert(out(0L) === ((true, 0L)))
    assert(out(1L) === ((true, 1L)))
    assert(out(100L) === ((false, 0L)), "later batch's copy must point at doc 0")
    assert(out(101L) === ((true, 101L)), "intra-batch: lower id wins")
    assert(out(102L) === ((false, 101L)))
  }

  test("LSH candidates: exact copy collides with bucket history") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[StreamDoc]
    val q = StreamingDedup.nearDupCandidates(mem.toDS())
      .writeStream.format("memory").queryName("cand_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(batch1)
    q.processAllAvailable()
    mem.addData(batch2)
    q.processAllAvailable()
    q.stop()
    val pairs = spark.table("cand_out").as[CandidatePair].collect().toSet
    assert(pairs.contains(CandidatePair(0L, 100L)),
      "an exact copy agrees on every band, so it must pair with the original")
    assert(pairs.contains(CandidatePair(101L, 102L)), "intra-batch copies pair too")
    assert(!pairs.exists(p => p.a == 1L || p.b == 1L),
      "the unrelated doc must not pair with anything")
  }
}
