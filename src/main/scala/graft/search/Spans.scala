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
/** Include-spans not near an exclude-span: rejected when an exclude span
  * ends after `start - pre` AND starts before `end + post` (reference:
  * Search/Spans/SpanNotQuery.cs:70-75,187-192 — pre/post widen the
  * exclusion window; 0/0 is the plain overlap test). */
final case class SpanNotQ(include: SpanQuery, exclude: SpanQuery,
                          pre: Int = 0, post: Int = 0) extends SpanQuery
final case class SpanFirstQ(sub: SpanQuery, end: Int) extends SpanQuery
final case class SpanNearQ(clauses: Seq[SpanQuery], slop: Int,
                           inOrder: Boolean) extends SpanQuery
/** Sub-spans lying wholly inside the position window [start, end)
  * (reference: Search/Spans/SpanPositionRangeQuery.cs — SpanFirst is its
  * start=0 special case). */
final case class SpanPositionRangeQ(sub: SpanQuery, start: Int,
                                    end: Int) extends SpanQuery
/** A multi-term query (prefix/wildcard/regexp/fuzzy) inside span algebra
  * (reference: Search/Spans/SpanMultiTermQueryWrapper.cs): the searcher
  * expands it against the term dictionary into a SpanOr of term spans
  * before evaluation. */
final case class SpanMultiTermQ(q: Query) extends SpanQuery

object Spans {

  /** All terms mentioned anywhere in the query (multi-term wrappers must
    * be expanded first — [[graft.search.Searcher.spanCount]] does). */
  def terms(q: SpanQuery): Set[String] = q match {
    case SpanTermQ(t) => Set(t)
    case SpanOrQ(cs) => cs.flatMap(terms).toSet
    case SpanNotQ(inc, exc, _, _) => terms(inc) ++ terms(exc)
    case SpanFirstQ(sub, _) => terms(sub)
    case SpanNearQ(cs, _, _) => cs.flatMap(terms).toSet
    case SpanPositionRangeQ(sub, _, _) => terms(sub)
    case SpanMultiTermQ(_) =>
      throw new IllegalStateException("unexpanded SpanMultiTermQ")
  }

  /** Spans of `q` in one doc, sorted by (start, end). `posOf` returns the
    * sorted token positions of a term (empty when absent). */
  def eval(q: SpanQuery, posOf: String => Array[Int]): Array[(Int, Int)] = q match {
    case SpanTermQ(t) => posOf(t).map(p => (p, p + 1))
    case SpanOrQ(cs) => cs.flatMap(c => eval(c, posOf)).toArray.sorted
    case SpanFirstQ(sub, end) => eval(sub, posOf).filter(_._2 <= end)
    case SpanPositionRangeQ(sub, start, end) =>
      eval(sub, posOf).filter(s => s._1 >= start && s._2 <= end)
    case SpanMultiTermQ(_) =>
      throw new IllegalStateException("unexpanded SpanMultiTermQ")
    case SpanNotQ(inc, exc, pre, post) =>
      val ex = eval(exc, posOf)
      eval(inc, posOf).filter(s =>
        !ex.exists(e => e._2 > s._1 - pre && e._1 < s._2 + post))
    case SpanNearQ(cs, slop, inOrder) =>
      val lists = cs.map(c => eval(c, posOf))
      if (lists.exists(_.isEmpty)) Array.empty
      else if (inOrder) nearOrdered(lists, slop)
      else nearUnordered(lists, slop)
  }

  /** Ordered chains s1..sn with s(k+1).start >= s(k).end, one potential
    * match per first-clause span; slop = covered width minus the spans'
    * own lengths = the sum of inter-span gaps.
    *
    * Unit spans (every clause a plain term): the first span starting
    * at/after prev.end simultaneously minimizes its gap and its end, so
    * the simple greedy is exact, and once the tail clauses are exhausted
    * no later anchor can chain either (chain ends are monotone in anchor
    * start) — early break is sound.
    *
    * Non-unit sub-spans (nested NEAR/OR clauses): the earliest-start span
    * can have a large end while a later shorter span still admits a chain
    * (the reference NearSpansOrdered advances/shrinks inner spans), so the
    * greedy would miss matches. Per anchor we instead search the clause
    * alternatives for the chain minimizing total gap (memoized on
    * (clause, prevEnd)); the anchor matches iff that minimum is within
    * slop — existence-exact against the reference's shrink loop. */
  private def nearOrdered(lists: Seq[Array[(Int, Int)]], slop: Int): Array[(Int, Int)] = {
    val out = new ArrayBuffer[(Int, Int)]()
    val arrs = lists.toArray
    val n = arrs.length
    val unitOnly = arrs.forall(_.forall(s => s._2 - s._1 == 1))
    if (unitOnly) {
      var exhausted = false
      for (a <- arrs(0) if !exhausted) {
        var prev = a
        var totalLen = a._2 - a._1
        var ok = true
        var k = 1
        while (ok && k < n) {
          var i = 0
          var found: (Int, Int) = null
          val l = arrs(k)
          while (found == null && i < l.length) {
            if (l(i)._1 >= prev._2) found = l(i)
            i += 1
          }
          if (found == null) { ok = false; exhausted = true }
          else { totalLen += found._2 - found._1; prev = found }
          k += 1
        }
        if (ok && (prev._2 - a._1) - totalLen <= slop) out += ((a._1, prev._2))
      }
    } else {
      // (minimal total gap, end of that chain) completing clauses k..n-1
      // after a sub-span ending at prevEnd; None when no chain exists
      val memo = scala.collection.mutable.HashMap.empty[(Int, Int), Option[(Int, Int)]]
      def best(k: Int, prevEnd: Int): Option[(Int, Int)] =
        if (k == n) Some((0, prevEnd))
        else memo.getOrElseUpdate((k, prevEnd), {
          var res: Option[(Int, Int)] = None
          arrs(k).foreach { s =>
            if (s._1 >= prevEnd) best(k + 1, s._2).foreach { case (g, e) =>
              val total = (s._1 - prevEnd) + g
              if (res.isEmpty || total < res.get._1 ||
                  (total == res.get._1 && e < res.get._2)) res = Some((total, e))
            }
          }
          res
        })
      arrs(0).foreach { a =>
        best(1, a._2) match {
          case Some((g, e)) if g <= slop => out += ((a._1, e))
          case _ => ()
        }
      }
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
