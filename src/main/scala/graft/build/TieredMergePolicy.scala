package graft.build

import scala.collection.mutable.ArrayBuffer

/** TieredMergePolicy — the reference's DEFAULT merge policy (reference:
  * Index/TieredMergePolicy.cs:81-88 defaults, :340-460 FindMerges,
  * :505-570 Score, :739-746 Size) restated as a PURE selection function
  * over segment metadata: given (bytes, docCount, delCount) per segment,
  * return which segments to merge together. No I/O here — the streaming
  * indexer feeds it generation stats and executes the chosen merges
  * ([[graft.streaming.StreamingIndexer.maintainTiered]]), exactly the
  * reference's split between policy (chooses) and scheduler (runs).
  *
  * Reference semantics preserved:
  *   - size(seg) = bytes × (1 − delRatio) — deletes shrink a segment's
  *     EFFECTIVE size (Size, :739);
  *   - segments ≥ maxMergedSegmentBytes/2 are graced out of the budget
  *     and never merged (:371);
  *   - allowed segment budget = segsPerTier per exponential level of
  *     floored min-segment size (:381-396);
  *   - candidates are windows of ≤ maxMergeAtOnce consecutive segments
  *     in size-descending order, where a segment that would push the
  *     merge past maxMergedSegmentBytes is SKIPPED and smaller ones are
  *     packed instead (hitTooLarge, :449-467);
  *   - score (lower = better) = skew × totAfterMergeBytes^0.05 ×
  *     nonDelRatio^reclaimDeletesWeight, with skew = floored largest /
  *     floored total (perfect 1/maxMergeAtOnce when hitTooLarge) —
  *     lopsided merges cascade to O(N²) merge cost, so skew dominates;
  *   - the loop keeps selecting merges (marking segments taken) until
  *     the remaining eligible count fits the budget, so one call can
  *     return several concurrent merges;
  *   - a too-large merge is not started while another is running
  *     (maxMergeIsRunning, :441-521).
  */
object TieredMergePolicy {

  /** Segment metadata: `id` is opaque (the streaming indexer passes the
    * generation id), `bytes` the raw stored size. */
  final case class Seg(id: Long, bytes: Long, docCount: Long, delCount: Long = 0L) {
    /** Effective (live) size — deletes pro-rated out, Size() analog. */
    def size: Long =
      if (docCount <= 0) bytes
      else (bytes * (1.0 - delCount.toDouble / docCount.toDouble)).toLong
  }

  final case class Config(
      maxMergeAtOnce: Int = 10,
      segsPerTier: Double = 10.0,
      maxMergedSegmentBytes: Long = 5L * 1024 * 1024 * 1024,
      floorSegmentBytes: Long = 2L * 1024 * 1024,
      reclaimDeletesWeight: Double = 2.0)

  final case class OneMerge(segments: Seq[Seg]) {
    def ids: Seq[Long] = segments.map(_.id)
  }

  private def floorSize(bytes: Long, cfg: Config): Long =
    math.max(cfg.floorSegmentBytes, bytes)

  /** The Score method (:505-570); lower is better. */
  def score(candidate: Seq[Seg], hitTooLarge: Boolean, cfg: Config): Double = {
    val totAfter = candidate.map(_.size).sum
    val totAfterFloored = candidate.map(s => floorSize(s.size, cfg)).sum
    val totBefore = candidate.map(_.bytes).sum
    val skew =
      if (hitTooLarge) 1.0 / cfg.maxMergeAtOnce
      else floorSize(candidate.head.size, cfg).toDouble / totAfterFloored
    val nonDelRatio = totAfter.toDouble / totBefore
    skew * math.pow(totAfter.toDouble, 0.05) *
      math.pow(nonDelRatio, cfg.reclaimDeletesWeight)
  }

  /** FindMerges (:340-460). `merging` = ids of segments already being
    * merged by a running scheduler (their raw bytes count toward
    * maxMergeIsRunning and they are ineligible). */
  def findMerges(segments: Seq[Seg], merging: Set[Long] = Set.empty,
                 cfg: Config = Config()): Seq[OneMerge] = {
    if (segments.isEmpty) return Nil
    val sorted = segments.sortBy(s => (-s.size, s.id))

    var totIndexBytes = sorted.map(_.size).sum
    var minSegmentBytes = sorted.map(_.size).min
    var tooBigCount = 0
    while (tooBigCount < sorted.length &&
           sorted(tooBigCount).size >= cfg.maxMergedSegmentBytes / 2.0) {
      totIndexBytes -= sorted(tooBigCount).size
      tooBigCount += 1
    }
    minSegmentBytes = floorSize(minSegmentBytes, cfg)

    var levelSize = minSegmentBytes
    var bytesLeft = totIndexBytes
    var allowedSegCount = 0.0
    var done = false
    while (!done) {
      val segCountLevel = bytesLeft.toDouble / levelSize.toDouble
      if (segCountLevel < cfg.segsPerTier) {
        allowedSegCount += math.ceil(segCountLevel)
        done = true
      } else {
        allowedSegCount += cfg.segsPerTier
        bytesLeft -= (cfg.segsPerTier * levelSize).toLong
        levelSize *= cfg.maxMergeAtOnce
      }
    }
    val allowedSegCountInt = allowedSegCount.toInt

    val spec = ArrayBuffer.empty[OneMerge]
    val toBeMerged = scala.collection.mutable.HashSet.empty[Long]
    var selecting = true
    while (selecting) {
      var mergingBytes = 0L
      val eligible = ArrayBuffer.empty[Seg]
      for (idx <- tooBigCount until sorted.length) {
        val s = sorted(idx)
        if (merging.contains(s.id)) mergingBytes += s.bytes
        else if (!toBeMerged.contains(s.id)) eligible += s
      }
      val maxMergeIsRunning = mergingBytes >= cfg.maxMergedSegmentBytes

      if (eligible.isEmpty || eligible.length < allowedSegCountInt) selecting = false
      else {
        var best: Seq[Seg] = null
        var bestScore = Double.MaxValue
        for (startIdx <- 0 to eligible.length - cfg.maxMergeAtOnce) {
          var totAfter = 0L
          val candidate = ArrayBuffer.empty[Seg]
          var hitTooLarge = false
          var idx = startIdx
          while (idx < eligible.length && candidate.length < cfg.maxMergeAtOnce) {
            val s = eligible(idx)
            if (totAfter + s.size > cfg.maxMergedSegmentBytes) hitTooLarge = true
            else { candidate += s; totAfter += s.size }
            idx += 1
          }
          if (candidate.nonEmpty) {
            val sc = score(candidate.toSeq, hitTooLarge, cfg)
            if (sc < bestScore && (!hitTooLarge || !maxMergeIsRunning)) {
              best = candidate.toSeq; bestScore = sc
            }
          }
        }
        if (best == null) selecting = false
        else {
          spec += OneMerge(best)
          best.foreach(s => toBeMerged += s.id)
        }
      }
    }
    spec.toSeq
  }
}
