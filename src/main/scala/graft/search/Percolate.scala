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
