package graft.search

import graft.SparkTestSession
import org.scalatest.funsuite.AnyFunSuite

/** Percolation ≡ brute-force stored-query evaluation (reference surface:
  * Lucene.Net.Memory/MemoryIndex.cs — one doc, all queries). */
class PercolateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val docs: Seq[(Long, Set[String])] = Seq(
    1L -> Set("spark", "index", "merge"),
    2L -> Set("spark", "sql"),
    3L -> Set("merge", "sort", "index"),
    4L -> Set("spark", "index", "sql", "merge"),
    5L -> Set("tokenizer"))

  private val qs: Seq[(Long, Seq[String], Seq[String])] = Seq(
    (10L, Seq("spark"), Seq.empty),                 // single MUST
    (11L, Seq("spark", "index"), Seq.empty),        // conjunction
    (12L, Seq("index"), Seq("sql")),                // MUST + MUST_NOT
    (13L, Seq("spark", "merge"), Seq("sort")),      // both
    (14L, Seq("absent_term"), Seq.empty))           // matches nothing

  test("percolate ≡ brute force over the cross product") {
    import spark.implicits._
    val queryDf = qs.toDF("query_id", "must", "must_not")
    val termDf = docs.flatMap { case (id, ts) => ts.map(t => (id, t)) }
      .toDF("doc_id", "term")
    val got = Percolate.percolate(queryDf, termDf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for {
      (qid, must, not) <- qs
      (did, terms) <- docs
      if must.forall(terms.contains) && !not.exists(terms.contains)
    } yield (qid, did)).toSet
    assert(got === want)
    assert(want.contains((13L, 4L)) && !want.exists(_._1 == 14L))
  }
}
