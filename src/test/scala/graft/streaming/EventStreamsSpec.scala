package graft.streaming

import java.sql.Timestamp
import graft.SparkTestSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Event-time streaming semantics: watermarked windows match the batch
  * answer; sessionization closes on gap and on watermark timeout; late
  * events inside the watermark still count. */
class EventStreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def ts(min: Int): Timestamp = new Timestamp(1700000000000L + min * 60000L)

  private val fixture = Seq(
    Event(0, ts(0), 1, "click", 1.0),
    Event(1, ts(2), 1, "click", 2.0),
    Event(2, ts(5), 2, "buy", 10.0),
    Event(3, ts(4), 1, "click", 3.0), // late but inside watermark
    Event(4, ts(50), 1, "click", 4.0), // new session for user 1 (gap > 30m)
    Event(5, ts(55), 2, "buy", 20.0),
    Event(6, ts(200), 9, "ping", 0.0)) // advances watermark far past everything

  test("windowed aggregation: streaming result == batch result on the same data") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("win_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(fixture.take(4))
    q.processAllAvailable()
    mem.addData(fixture.drop(4))
    q.processAllAvailable()
    q.stop()
    val streaming = spark.table("win_out")
      .select($"w_start", $"event_type", $"n", $"v")
      .collect().map(_.toString).sorted.toSeq
    // batch path: same transform on a static frame. Streaming append mode
    // only emits windows the watermark has CLOSED — the ping's own window
    // stays open forever (nothing later advances the watermark past it),
    // so it is exactly the delta between the two answers.
    val batch = EventStreams.windowedCounts(fixture.toDF())
      .where($"event_type" =!= "ping")
      .collect().map(_.toString).sorted.toSeq
    assert(streaming.nonEmpty)
    assert(streaming === batch)
  }

  test("sessionization: gap splits sessions, totals and bounds are right") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    mem.addData(fixture.take(6))
    q.processAllAvailable()
    mem.addData(fixture.drop(6)) // watermark jumps to ~t170 → all sessions time out
    q.processAllAvailable()
    q.stop()
    val sessions = spark.table("sess_out").as[UserSession].collect()
      .sortBy(s => (s.user_id, s.start.getTime))
    val u1 = sessions.filter(_.user_id == 1)
    assert(u1.length === 2, s"user 1 must have 2 sessions: ${sessions.mkString(", ")}")
    assert(u1(0).n_events === 3 && u1(0).total_value === 6.0)
    assert(u1(0).start === ts(0) && u1(0).end === ts(4))
    assert(u1(1).n_events === 1 && u1(1).total_value === 4.0)
    // user 2's buys are 50 min apart — past the 30 min gap: two sessions
    val u2 = sessions.filter(_.user_id == 2)
    assert(u2.length === 2)
    assert(u2(0).n_events === 1 && u2(0).total_value === 10.0)
    assert(u2(1).n_events === 1 && u2(1).total_value === 20.0)
  }
}
