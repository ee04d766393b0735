package graft.search

import scala.collection.mutable

/** Sloppy-phrase matching with the reference's exact semantics
  * (reference: /root/reference/src/Lucene.Net/Search/SloppyPhraseScorer.cs:
  * 33-746, restated as a pure per-document function — the scorer's
  * pull-iterator state machine over postings becomes a loop over
  * in-memory position lists gathered by re-analysis).
  *
  * Semantics replicated:
  *   - each slot's positions are phrase-adjusted (`pos - offset`), so an
  *    exact match is all slots at equal adjusted position;
  *   - the min-adjusted-position slot is repeatedly advanced via a
  *     priority queue ordered by (position, offset) (PhraseQueue.cs:33-48);
  *     a match event fires when the popped minimum overtakes the next
  *     queue head, contributing slopFactor = 1/(1+matchLength) to the
  *     phrase freq when matchLength = end - min ≤ slop
  *     (SloppyPhraseScorer.cs:106-148; slop factor =
  *     Similarities/Similarity.cs ComputeSlopFactor) — so out-of-order
  *     terms match within slop ("a b"~2 matches "b a" at distance 2);
  *   - repeated phrase terms form repeat groups sorted by query offset
  *     (SortRptGroups, :438-451): at init the j-th repeat advances j
  *     positions (AdvanceRepeatGroups, :335-380), and after every advance
  *     a collision (two repeats on one token position) is resolved by
  *     advancing the lesser pp (AdvanceRpts, :165-213) — "h h h h" never
  *     matches "h h h x x x h h h" at small slop (LUCENE-3412 behavior);
  *   - greedy minimization: not every valid combination is counted
  *     (the reference's documented performance trade, :89-103) — the
  *     traversal is replicated exactly, so freqs agree to the ulp.
  */
object SloppyPhrase {

  private final class PP(val offset: Int, val positions: Array[Int]) {
    var rptGroup: Int = -1
    var rptInd: Int = -1
    var idx: Int = 0
    var position: Int = 0 // adjusted: positions(idx) - offset
    def place(): Unit = { idx = 0; position = positions(0) - offset }
    def next(): Boolean = {
      idx += 1
      if (idx >= positions.length) false
      else { position = positions(idx) - offset; true }
    }
    def tpPos: Int = position + offset
  }

  /** Phrase frequency of one document. `slots(i)` = sorted token positions
    * of the phrase's i-th term in the doc; every slot must be non-empty
    * (candidate docs contain all phrase terms). `sameTerm(i)(j)` is
    * encoded by passing the terms themselves. */
  def freq(terms: IndexedSeq[String], posOf: String => Array[Int], slop: Int): Float = {
    val n = terms.length
    require(n >= 2, "sloppy phrase needs at least 2 slots")
    val pps = Array.tabulate(n)(i => new PP(i, posOf(terms(i))))
    if (pps.exists(_.positions.isEmpty)) return 0f

    // repeat groups: slots sharing a term, sorted by query offset
    val rptGroups: Array[Array[PP]] = terms.zipWithIndex
      .groupBy(_._1).valuesIterator
      .filter(_.length > 1)
      .map(_.map(x => pps(x._2)).sortBy(_.offset).toArray)
      .toArray
    for (g <- rptGroups.indices; k <- rptGroups(g).indices) {
      rptGroups(g)(k).rptGroup = g
      rptGroups(g)(k).rptInd = k
    }
    val hasRpts = rptGroups.nonEmpty

    var end = Int.MinValue
    pps.foreach(_.place())

    def advancePP(p: PP): Boolean = {
      if (!p.next()) false
      else { if (p.position > end) end = p.position; true }
    }

    // AdvanceRepeatGroups (no multi-term postings in PhraseQ): the j-th
    // repeat starts j positions in, giving the no-collision start state
    for (rg <- rptGroups; j <- 1 until rg.length; _ <- 0 until j)
      if (!rg(j).next()) return 0f
    // fix up `end` after the group advances
    pps.foreach(p => if (p.position > end) end = p.position)

    val pq = new java.util.PriorityQueue[PP](n,
      (a: PP, b: PP) =>
        if (a.position != b.position) Integer.compare(a.position, b.position)
        else Integer.compare(a.offset, b.offset))
    pps.foreach(pq.add)

    def collideIdx(p: PP): Int = {
      val rg = rptGroups(p.rptGroup)
      val tp = p.tpPos
      var i = 0
      while (i < rg.length) {
        if ((rg(i) ne p) && rg(i).tpPos == tp) return i
        i += 1
      }
      -1
    }

    def lesser(a: PP, b: PP): PP =
      if (a.position < b.position ||
        (a.position == b.position && a.offset < b.offset)) a else b

    /** Resolve collisions caused by advancing p0; re-heapify queued pps
      * whose positions changed (the reference's bits + rptStack dance —
      * remove/re-add is equivalent under the total (position, offset)
      * order). Returns false when a pp exhausts. */
    def advanceRpts(p0: PP): Boolean = {
      if (p0.rptGroup < 0) return true
      val rg = rptGroups(p0.rptGroup)
      val k0 = p0.rptInd
      val marked = mutable.Set.empty[PP]
      var cur = p0
      var k = collideIdx(cur)
      while (k >= 0) {
        cur = lesser(cur, rg(k))
        if (!advancePP(cur)) return false
        if (k != k0) marked += rg(k)
        k = collideIdx(cur)
      }
      marked.foreach(pq.remove)
      marked.foreach(pq.add)
      true
    }

    var freq = 0f
    var pp = pq.poll()
    var matchLength = end - pp.position
    var next = pq.peek().position
    var exhausted = false
    while (!exhausted && advancePP(pp)) {
      if (hasRpts && !advanceRpts(pp)) exhausted = true
      else if (pp.position > next) { // done minimizing current match-length
        if (matchLength <= slop) freq += 1f / (1f + matchLength)
        pq.add(pp)
        pp = pq.poll()
        next = pq.peek().position
        matchLength = end - pp.position
      } else {
        val ml2 = end - pp.position
        if (ml2 < matchLength) matchLength = ml2
      }
    }
    if (matchLength <= slop) freq += 1f / (1f + matchLength)
    freq
  }
}
