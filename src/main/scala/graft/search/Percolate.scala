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

  /** Serialize a stored-query set into a TABLE — the non-broadcast
    * percolation's stored side: (query_id, qbytes) with the Query ADT
    * Java-serialized (all Query nodes are case classes). At real scale
    * this table is persisted once and read per batch; the Seq overload is
    * the bootstrap convenience. */
  def queryTable(spark: org.apache.spark.sql.SparkSession,
      queries: Seq[(Long, Query)]): DataFrame = {
    import spark.implicits._
    queries.map { case (id, q) => (id, serializeQuery(q)) }
      .toDF("query_id", "qbytes")
  }

  private[graft] def serializeQuery(q: Query): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(q); oos.close()
    bos.toByteArray
  }

  private[graft] def deserializeQuery(b: Array[Byte]): Query = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    try ois.readObject().asInstanceOf[Query] finally ois.close()
  }

  /** Full-query percolation WITHOUT broadcasting the stored queries — the
    * scale path for saved-search sets past broadcast size (millions of
    * alerts): the required-term prescreen becomes an EQUI-JOIN of the
    * docs' distinct terms against a (query_id, required term) table, the
    * conjunctive count filter keeps only (query_id, doc_id) candidates
    * whose doc holds ALL required terms, and the full [[MemoryIndex]]
    * evaluation runs over candidates only — repartitioned by doc so each
    * doc is analyzed ONCE per partition run, with a per-partition query
    * deserialization cache. Queries with NO required terms (pure
    * disjunctions over multi-term leaves) cannot be prescreened and fall
    * back to evaluating against every doc — they are the percolation
    * analog of a full scan and should be rare in a real alert set.
    *
    * Result ≡ [[memoryPercolate]] (PercolateSpec proves it with
    * autoBroadcastJoinThreshold=-1). */
  def memoryPercolateJoin(docs: DataFrame, queryTab: DataFrame,
      analyzer: graft.analysis.Analyzer): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val qreq = queryTab.select(col("query_id"), col("qbytes"))
      .as[(Long, Array[Byte])]
      .flatMap { case (id, b) =>
        val req = MemoryIndex.requiredTerms(deserializeQuery(b))
        if (req.isEmpty) Iterator((id, null: String, 0))
        else req.iterator.map(t => (id, t, req.size))
      }.toDF("query_id", "term", "n_req")
    val docTerms = docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        analyzer.analyzeTerms(text).distinct.iterator.map(t => (id, t))
      }.toDF("doc_id", "term")
    val screened = qreq.where(col("term").isNotNull)
      .join(docTerms, Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("got"), max(col("n_req")).as("n_req"))
      .where(col("got") === col("n_req"))
      .select(col("query_id"), col("doc_id"))
    val unscreenable = qreq.where(col("term").isNull)
      .select(col("query_id")).distinct()
      .crossJoin(docs.select(col("doc_id")))
      .select(col("query_id"), col("doc_id"))
    val candidates = screened.union(unscreenable)
    candidates
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .join(queryTab, Seq("query_id"))
      .repartition(col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .select(col("doc_id"), col("text"), col("query_id"), col("qbytes"))
      .as[(Long, String, Long, Array[Byte])]
      .mapPartitions { it =>
        val qcache = scala.collection.mutable.HashMap.empty[Long, Query]
        var curDoc = Long.MinValue
        var mi: MemoryIndex = null
        it.flatMap { case (docId, text, qid, qb) =>
          if (docId != curDoc || mi == null) {
            curDoc = docId
            mi = MemoryIndex.fromText(text, analyzer)
          }
          val q = qcache.getOrElseUpdate(qid, deserializeQuery(qb))
          if (mi.matches(q)) Iterator((qid, docId)) else Iterator.empty
        }
      }.toDF("query_id", "doc_id")
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
