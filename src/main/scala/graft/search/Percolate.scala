package graft.search

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percolation — stored queries matched against incoming documents
  * (reference: /root/reference/src/Lucene.Net.Memory/MemoryIndex.cs,
  * whose class doc bills it as the "prospective search" primitive: index
  * ONE document in RAM, run every stored query against it).
  *
  * The reference shape is a per-document loop over all stored queries —
  * O(docs × queries) driver work. The Spark-native inversion makes both
  * sides tables and turns matching into ONE term equi-join:
  *   - stored queries (query_id, must[], must_not[]) explode to
  *     (query_id, term) rows — the "query index" half;
  *   - each incoming document contributes its distinct analyzed terms
  *     (the MemoryIndex of that doc, one row per term);
  *   - a conjunctive query matches a doc iff the join hits ALL its MUST
  *     terms (count == |must|) and none of its MUST_NOT terms
  *     (left-anti on the negative explode).
  * At 100 TB of incoming docs this is a shuffle on term with map-side
  * combine and AQE skew handling — no per-doc query loop, no driver
  * materialization; the small side (query definitions) broadcasts.
  */
object Percolate {

  /** Full-query percolation through [[MemoryIndex]] — each incoming
    * document is analyzed ONCE into a single-doc index and every stored
    * query (arbitrary ADT: phrases, slop, multi-term, boolean, function
    * scores) is evaluated against it per-partition. The stored query set
    * broadcasts; the job is MAP-ONLY — zero shuffles, scales linearly
    * with document bytes at any cluster size (the ideal 100 TB shape).
    * A conjunctive required-term prescreen ([[MemoryIndex.requiredTerms]])
    * skips non-candidate queries before full evaluation, the reference
    * percolation idiom. For query sets too large to broadcast, compose:
    * run [[percolate]]'s term equi-join over the queries' required terms
    * to get (query_id, doc_id) candidates, then refine those pairs here.
    *
    * @param docs    (doc_id: long, text: string)
    * @param queries stored (query_id, parsed query) pairs
    * @return (query_id, doc_id) match pairs
    */
  def memoryPercolate(docs: DataFrame, queries: Seq[(Long, Query)],
      analyzer: graft.analysis.Analyzer): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(queries)
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(it => evalPartition(bc.value, analyzer, it))
      .toDF("query_id", "doc_id")
  }

  /** The per-partition percolation body — required-term prescreen + full
    * [[MemoryIndex]] evaluation of every stored query against each
    * (docId, text). Shared by this batch entry and
    * [[graft.streaming.StreamingPercolate.alerts]] (the streaming form
    * is the SAME pure map); call it inside `mapPartitions` with the
    * broadcast's value. */
  private[graft] def evalPartition(qs: Seq[(Long, Query)],
      analyzer: graft.analysis.Analyzer,
      it: Iterator[(Long, String)]): Iterator[(Long, Long)] = {
    val required = qs.map(q => MemoryIndex.requiredTerms(q._2))
    it.flatMap { case (docId, text) =>
      val mi = MemoryIndex.fromText(text, analyzer)
      qs.iterator.zip(required.iterator).collect {
        case ((qid, q), req)
            if req.forall(mi.contains) && mi.matches(q) => (qid, docId)
      }
    }
  }

  /** Match stored conjunctive queries against document term sets.
    *
    * @param queries  (query_id: long, must: array<string> non-empty,
    *                 must_not: array<string>)
    * @param docTerms (doc_id: long, term: string) — DISTINCT terms per doc
    * @return (query_id, doc_id) pairs where the doc satisfies the query
    */
  def percolate(queries: DataFrame, docTerms: DataFrame): DataFrame = {
    val nMust = queries.select(col("query_id"), size(col("must")).as("n_must"))
    val positive = queries
      .select(col("query_id"), explode(col("must")).as("term"))
      .join(docTerms, Seq("term"))
      .groupBy("query_id", "doc_id").agg(count(lit(1)).as("got"))
      .join(broadcast(nMust), Seq("query_id"))
      .where(col("got") === col("n_must"))
      .select("query_id", "doc_id")
    val negative = queries
      .select(col("query_id"), explode(col("must_not")).as("term"))
      .join(docTerms, Seq("term"))
      .select("query_id", "doc_id")
    positive.join(negative, Seq("query_id", "doc_id"), "left_anti")
  }
}
