package graft.streaming

import graft.analysis.Analyzer
import graft.search.Query
import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming percolation — the alerting use of prospective search
  * (reference: Lucene.Net.Memory/MemoryIndex.cs, whose class doc names
  * the pattern: saved searches evaluated against every ARRIVING document,
  * not documents evaluated against a saved index): subscriptions are the
  * stored side, the document stream is the query side, and each arriving
  * doc fires the (query_id, doc_id) alerts it matches.
  *
  * Spark-first shape: percolation against a broadcastable stored-query
  * set is STATELESS per document — one MemoryIndex build + ADT evaluation
  * per doc, no cross-doc state — so the streaming form is the same
  * map-only `mapPartitions` the batch path uses
  * ([[graft.search.Percolate.memoryPercolate]]), applied to an unbounded
  * stream: zero shuffles, zero state store, per-micro-batch cost linear
  * in arriving bytes, trivially correct under retrigger/replay because
  * the operator is a pure function of the row. (Stored-query sets too
  * large to broadcast compose the term-join prescreen first, exactly as
  * the batch scale path documents.) */
object StreamingPercolate {

  /** Alerts for an unbounded [[StreamDoc]] stream: one (query_id, doc_id)
    * row per stored query the arriving doc matches. Append-mode safe —
    * stateless, no watermark needed. */
  def alerts(docs: Dataset[StreamDoc], queries: Seq[(Long, Query)],
             analyzer: Analyzer = Analyzer.standard): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(queries)
    docs.mapPartitions(it =>
      graft.search.Percolate.evalPartition(bc.value, analyzer,
        it.map(d => (d.doc_id, d.text))))
      .toDF("query_id", "doc_id")
  }

  /** The NON-broadcast streaming form, for stored-query sets past
    * broadcast size (millions of saved searches): per micro-batch, run
    * [[graft.search.Percolate.memoryPercolateJoin]] — the required-term
    * equi-join prescreen + candidate-only MemoryIndex refine — against
    * the persisted query TABLE. Percolation is stateless per document,
    * so `foreachBatch` composition is exact (each batch is an
    * independent pure function of its rows); `sink` receives each
    * batch's (query_id, doc_id) alerts with the batch id. */
  def alertsJoinWriter(docs: Dataset[StreamDoc], queryTab: DataFrame,
      analyzer: Analyzer = Analyzer.standard)(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[StreamDoc] =
    docs.writeStream.foreachBatch { (batch: Dataset[StreamDoc], id: Long) =>
      sink(graft.search.Percolate.memoryPercolateJoin(
        batch.toDF(), queryTab, analyzer), id)
    }
}
