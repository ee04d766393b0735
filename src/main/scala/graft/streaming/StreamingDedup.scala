package graft.streaming

import graft.pipeline.Dedup
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One streaming document: id + raw text. */
final case class StreamDoc(doc_id: Long, text: String)

/** Verdict for one arriving doc: first occurrence of its content, or a
  * duplicate of `keeper` (the first-seen doc_id for that hash). */
final case class DedupDecision(doc_id: Long, content_hash: String,
                               is_first: Boolean, keeper: Long)

/** A near-dup candidate pair (a < b). May be emitted more than once (one
  * per colliding band / batch) — consumers dedup with `dropDuplicates`,
  * exactly as the batch path's `candidatePairs` applies `distinct`. */
final case class CandidatePair(a: Long, b: Long)

/** One streaming document with event time — the bounded-state dedup's
  * input (TTL expiry is event-time-driven). */
final case class TimedDoc(doc_id: Long, text: String,
                          event_time: java.sql.Timestamp)

private final case class BucketArrival(bucket: String, doc_id: Long)

/** Streaming-ingest deduplication (beyond the reference, like
  * EventStreams): the corpus pipeline's dedup decisions made AT INGEST
  * over an unbounded stream, instead of as a batch pass later.
  *
  *   - [[decisions]] — exact dedup: state per content hash = first-seen
  *     doc_id; every arriving doc is verdicted immediately. State is
  *     hash-keyed (corpus-lifetime by definition — a duplicate may arrive
  *     years later), so `NoTimeout`; at real scale the state store is
  *     RocksDB and entries are 16-byte-hash → 8-byte-id.
  *   - [[nearDupCandidates]] — MinHash-LSH candidate generation: each doc
  *     maps to its band buckets (pure per-doc compute), state per bucket =
  *     docs seen in it (capped — a bucket past the cap is a boilerplate
  *     cluster already flagged by its first `cap` members); new arrivals
  *     pair against the bucket's history. The streaming analog of the
  *     batch `lshBuckets` + bucket self-join.
  *
  * Both are `flatMapGroupsWithState` over `groupByKey` — the custom-state
  * streaming shape (same frame as [[EventStreams.sessionize]]). */
object StreamingDedup {

  /** Exact-dedup verdicts for an unbounded doc stream. */
  def decisions(docs: Dataset[StreamDoc]): Dataset[DedupDecision] = {
    import docs.sparkSession.implicits._
    docs.map(d => (d.doc_id, md5Hex(d.text)))
      .groupByKey(_._2)
      .flatMapGroupsWithState[Long, DedupDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (hash: String, it: Iterator[(Long, String)], state: GroupState[Long]) =>
          val ids = it.map(_._1).toArray.sorted // deterministic intra-batch order
          val out = scala.collection.mutable.ArrayBuffer.empty[DedupDecision]
          var keeper = state.getOption.getOrElse(-1L)
          ids.foreach { id =>
            if (keeper < 0) { keeper = id; out += DedupDecision(id, hash, true, id) }
            else out += DedupDecision(id, hash, false, keeper)
          }
          state.update(keeper)
          out.iterator
      }
  }

  /** Exact-dedup verdicts with BOUNDED state — the production form of
    * [[decisions]] for corpus-lifetime streams where a state entry per
    * distinct content hash forever would grow the state store to the
    * size of the corpus hash set:
    *
    *   - HOT TIER: state per content hash, expired `ttlMs` after the
    *     hash's latest event time (EventTimeTimeout — expiry rides the
    *     stream's own watermark, so reprocessing is deterministic).
    *   - RECONCILIATION TIER: every arrival stream-static left-joins
    *     `corpusHashes` (content_hash, keeper) — the compacted batch
    *     table a periodic job maintains from this stream's own output
    *     (e.g. `decisions.where(is_first)` appended each compaction
    *     run). A duplicate arriving AFTER its hash's hot entry expired
    *     is still verdicted against the original keeper through the
    *     join; only hashes absent from BOTH tiers count as first.
    *
    * State is bounded by the TTL window's distinct-hash count instead of
    * the corpus's; late duplicates beyond the TTL resolve through the
    * batch table, which lives in cheap columnar storage instead of the
    * state store. A doc whose hash expired before the compaction job
    * recorded it re-enters as first — compaction cadence must beat the
    * TTL, the documented operational contract. */
  def decisionsBounded(docs: Dataset[TimedDoc],
                       corpusHashes: org.apache.spark.sql.DataFrame,
                       ttlMs: Long,
                       maxLateness: String = "0 seconds"): Dataset[DedupDecision] = {
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val hashed = docs.map(d => (d.doc_id, md5Hex(d.text), d.event_time))
      .toDF("doc_id", "content_hash", "event_time")
      .withWatermark("event_time", maxLateness)
    val joined = hashed.join(
        corpusHashes.select(col("content_hash"), col("keeper").as("batch_keeper")),
        Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"), col("event_time"),
        col("batch_keeper"))
      .as[(Long, String, java.sql.Timestamp, Option[Long])]
    joined.groupByKey(_._2)
      .flatMapGroupsWithState[Long, DedupDecision](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (hash: String, it: Iterator[(Long, String, java.sql.Timestamp, Option[Long])],
         state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val rows = it.toArray.sortBy(_._1)
            val out = scala.collection.mutable.ArrayBuffer.empty[DedupDecision]
            var keeper = state.getOption.getOrElse(-1L)
            rows.foreach { case (id, _, _, batchKeeper) =>
              if (keeper < 0) keeper = batchKeeper.getOrElse(id)
              out += DedupDecision(id, hash, id == keeper, keeper)
            }
            state.update(keeper)
            val maxEt = rows.iterator.map(_._3.getTime).max
            // must exceed the current watermark or Spark rejects it
            state.setTimeoutTimestamp(
              math.max(maxEt, state.getCurrentWatermarkMs() + 1L) + ttlMs)
            out.iterator
          }
      }
  }

  /** Near-dup candidate pairs for an unbounded doc stream. The per-doc
    * MinHash here is pure Scala (a stream task cannot run a dictionary
    * job per micro-batch); it shares the batch path's affine-hash family
    * and banding but not its hash VALUES — candidates still get confirmed
    * by exact Jaccard downstream, so only recall shape matters. */
  def nearDupCandidates(docs: Dataset[StreamDoc],
                        maxPerBucket: Int = 16): Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    val nBands = Dedup.NumBands
    val rows = Dedup.RowsPerBand
    docs.flatMap { d =>
      val toks = TokenRe.findAllIn(d.text.toLowerCase).toArray
      if (toks.length < 3) Iterator.empty
      else {
        val shingles = toks.sliding(3).map(_.mkString(" ")).toArray.distinct
        val sig = Array.tabulate(nBands * rows) { k =>
          var m = Long.MaxValue
          shingles.foreach { s =>
            val h = ((s.hashCode.toLong & 0x7fffffffL) * Dedup.MinHashA(k) +
              Dedup.MinHashB(k)) % Dedup.MinHashP
            if (h < m) m = h
          }
          m
        }
        (0 until nBands).iterator.map { b =>
          val key = (0 until rows).map(r => sig(b * rows + r)).mkString(",")
          BucketArrival(s"$b:$key", d.doc_id)
        }
      }
    }.groupByKey(_.bucket)
      .flatMapGroupsWithState[Seq[Long], CandidatePair](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (bucket: String, it: Iterator[BucketArrival], state: GroupState[Seq[Long]]) =>
          val out = scala.collection.mutable.LinkedHashSet.empty[CandidatePair]
          var cur = state.getOption.getOrElse(Seq.empty)
          it.map(_.doc_id).toArray.sorted.distinct.foreach { id =>
            if (!cur.contains(id)) {
              cur.foreach(prev => out +=
                CandidatePair(math.min(prev, id), math.max(prev, id)))
              if (cur.size < maxPerBucket) cur = cur :+ id
            }
          }
          state.update(cur)
          out.iterator
      }
  }

  private val TokenRe = "[a-z0-9_]+".r

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.map(b => f"$b%02x").mkString
  }
}
