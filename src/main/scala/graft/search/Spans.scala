package graft.search

import scala.collection.mutable.ArrayBuffer

/** Span (interval) query algebra over token positions (reference:
  * Search/Spans/ — SpanTermQuery.cs, SpanOrQuery.cs, SpanNotQuery.cs,
  * SpanFirstQuery.cs, SpanNearQuery.cs with NearSpansOrdered.cs /
  * NearSpansUnordered.cs — restated as pure position-list algebra
  * evaluated per candidate doc on the QUERY_FIRST re-analysis frame).
  *
  * A span is a half-open position interval [start, end). Semantics:
  *   - term: one unit span per occurrence;
  *   - or: sorted merge of sub-spans (duplicates kept, like the
  *     reference's priority-queue merge);
  *   - first(sub, n): sub-spans ending within the first n positions
  *     (span.end <= n — SpanFirstQuery/SpanPositionRangeQuery);
  *   - not(inc, exc): inc-spans overlapping no exc-span (SpanNotQuery);
  *   - near(clauses, slop, inOrder): n-clause proximity —
  *     ordered: greedy minimal chains s1..sn with s(k+1).start >= s(k).end
  *     and (sn.end - s1.start) - Σ len(si) <= slop (NearSpansOrdered's
  *     match condition); unordered: sliding pointer set, match when
  *     (max end - min start) - Σ len <= slop, the min-start clause
  *     advancing each round (NearSpansUnordered's queue walk). */
sealed trait SpanQuery extends Serializable
final case class SpanTermQ(term: String) extends SpanQuery
final case class SpanOrQ(clauses: Seq[SpanQuery]) extends SpanQuery
final case class SpanNotQ(include: SpanQuery, exclude: SpanQuery) extends SpanQuery
final case class SpanFirstQ(sub: SpanQuery, end: Int) extends SpanQuery
final case class SpanNearQ(clauses: Seq[SpanQuery], slop: Int,
                           inOrder: Boolean) extends SpanQuery

object Spans {

  /** All terms mentioned anywhere in the query. */
  def terms(q: SpanQuery): Set[String] = q match {
    case SpanTermQ(t) => Set(t)
    case SpanOrQ(cs) => cs.flatMap(terms).toSet
    case SpanNotQ(inc, exc) => terms(inc) ++ terms(exc)
    case SpanFirstQ(sub, _) => terms(sub)
    case SpanNearQ(cs, _, _) => cs.flatMap(terms).toSet
  }

  /** Spans of `q` in one doc, sorted by (start, end). `posOf` returns the
    * sorted token positions of a term (empty when absent). */
  def eval(q: SpanQuery, posOf: String => Array[Int]): Array[(Int, Int)] = q match {
    case SpanTermQ(t) => posOf(t).map(p => (p, p + 1))
    case SpanOrQ(cs) => cs.flatMap(c => eval(c, posOf)).toArray.sorted
    case SpanFirstQ(sub, end) => eval(sub, posOf).filter(_._2 <= end)
    case SpanNotQ(inc, exc) =>
      val ex = eval(exc, posOf)
      eval(inc, posOf).filter(s => !ex.exists(e => e._1 < s._2 && s._1 < e._2))
    case SpanNearQ(cs, slop, inOrder) =>
      val lists = cs.map(c => eval(c, posOf))
      if (lists.exists(_.isEmpty)) Array.empty
      else if (inOrder) nearOrdered(lists, slop)
      else nearUnordered(lists, slop)
  }

  /** Greedy minimal ordered chains: for each span of the first clause,
    * chain each later clause's first span starting at/after the previous
    * end; a chain within slop is one match. */
  private def nearOrdered(lists: Seq[Array[(Int, Int)]], slop: Int): Array[(Int, Int)] = {
    val out = new ArrayBuffer[(Int, Int)]()
    val n = lists.length
    var exhausted = false
    for (a <- lists.head if !exhausted) {
      var prev = a
      var totalLen = a._2 - a._1
      var ok = true
      var k = 1
      while (ok && k < n) {
        lists(k).find(_._1 >= prev._2) match {
          case None => ok = false; exhausted = true // later chains start even later
          case Some(s) => totalLen += s._2 - s._1; prev = s
        }
        k += 1
      }
      // slop = covered width minus the clauses' own lengths
      if (ok && (prev._2 - a._1) - totalLen <= slop) out += ((a._1, prev._2))
    }
    out.toArray
  }

  /** Sliding pointer set over all clauses: window = (min start, max end);
    * match when window width minus span lengths <= slop; the min-start
    * clause advances each round. */
  private def nearUnordered(lists: Seq[Array[(Int, Int)]], slop: Int): Array[(Int, Int)] = {
    val out = new ArrayBuffer[(Int, Int)]()
    val n = lists.length
    val ptr = new Array[Int](n)
    var done = false
    while (!done) {
      var minStart = Int.MaxValue
      var minIdx = -1
      var maxEnd = Int.MinValue
      var totalLen = 0
      var i = 0
      while (i < n) {
        val s = lists(i)(ptr(i))
        if (s._1 < minStart) { minStart = s._1; minIdx = i }
        if (s._2 > maxEnd) maxEnd = s._2
        totalLen += s._2 - s._1
        i += 1
      }
      if ((maxEnd - minStart) - totalLen <= slop) out += ((minStart, maxEnd))
      ptr(minIdx) += 1
      if (ptr(minIdx) >= lists(minIdx).length) done = true
    }
    out.toArray
  }
}
