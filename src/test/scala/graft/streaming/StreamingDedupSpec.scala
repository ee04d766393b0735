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

  test("bounded decisions: TTL expires hot state; reconciliation tier still catches") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    def ts(min: Long) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    def md5(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    // the compacted batch table: "old" was first seen by doc 500 in a past
    // run; "fresh" is doc 2's own hash, recorded by the compaction job
    val corpus = Seq((md5("old"), 500L), (md5("fresh"), 2L))
      .toDF("content_hash", "keeper")
    val mem = MemoryStream[TimedDoc]
    val q = StreamingDedup.decisionsBounded(mem.toDS(), corpus,
        ttlMs = 30L * 60000L)
      .writeStream.format("memory").queryName("bounded_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    def out() = spark.table("bounded_out").as[DedupDecision]
      .collect().map(d => d.doc_id -> ((d.is_first, d.keeper))).toMap
    // t+0: "old" reconciles against the batch tier; "fresh"'s keeper IS
    // doc 2 (compaction recorded its own first-seen), so it stays first;
    // "ephemeral" is in neither tier
    mem.addData(Seq(TimedDoc(1L, "old", ts(0)), TimedDoc(2L, "fresh", ts(0)),
      TimedDoc(7L, "ephemeral", ts(0))))
    q.processAllAvailable()
    assert(out()(1L) === ((false, 500L)))
    assert(out()(2L) === ((true, 2L)))
    assert(out()(7L) === ((true, 7L)))
    // t+10 (inside TTL): duplicate resolves via HOT state
    mem.addData(Seq(TimedDoc(3L, "fresh", ts(10))))
    q.processAllAvailable()
    assert(out()(3L) === ((false, 2L)))
    // t+120 advances the watermark far past every timeout; the next
    // trigger processes the expirations
    mem.addData(Seq(TimedDoc(4L, "bump1", ts(120))))
    q.processAllAvailable()
    mem.addData(Seq(TimedDoc(6L, "bump2", ts(121))))
    q.processAllAvailable()
    // t+122: both hot entries are gone. "fresh" is STILL caught — the
    // reconciliation join points it at keeper 2; "ephemeral" was never
    // compacted into the batch table, so its reappearance re-enters as
    // first (proving the hot state genuinely expired).
    mem.addData(Seq(TimedDoc(5L, "fresh", ts(122)), TimedDoc(8L, "ephemeral", ts(122))))
    q.processAllAvailable()
    q.stop()
    assert(out()(5L) === ((false, 2L)),
      "expired-then-reappearing hash must resolve through the batch tier")
    assert(out()(8L) === ((true, 8L)),
      "a hash in neither tier re-enters as first — the state really expired")
  }
}
