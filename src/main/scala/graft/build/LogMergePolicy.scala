package graft.build

import scala.collection.mutable.ArrayBuffer

/** LogMergePolicy — the reference's ORIGINAL (pre-Tiered) merge-policy
  * family (reference: Index/LogMergePolicy.cs:562-726 FindMerges,
  * :265-307 FindForcedMergesSizeLimit, :314-375
  * FindForcedMergesMaxNumSegments, :468-533 FindForcedDeletesMerges;
  * subclasses Index/LogByteSizeMergePolicy.cs and
  * Index/LogDocMergePolicy.cs differing only in Size()). Unlike Tiered,
  * Log policies NEVER reorder: every merge is a run of ADJACENT segments
  * in index (arrival) order, so doc order is preserved across merges —
  * the policy you pick when the index is sorted by ingestion time and
  * queries early-terminate on that order.
  *
  * Pure selection function over segment metadata, like
  * [[TieredMergePolicy]]: no I/O, the streaming indexer executes the
  * chosen merges ([[graft.streaming.StreamingIndexer.maintainLog]]).
  *
  * Reference semantics preserved:
  *   - level(seg) = log(max(1, size))/log(mergeFactor) as FLOAT — the
  *     reference quantizes in float32, and level-boundary comparisons
  *     can differ from double math, so we keep float;
  *   - a level spans LEVEL_LOG_SPAN = 0.75 below the current max, with
  *     a forced boundary at the levelFloor (= log of minMergeSize);
  *     everything below the floor collapses into one bottom level;
  *   - the level extends right to the RIGHTMOST segment within span —
  *     interleaved small segments are pulled up into the higher level
  *     (the "or who has such a segment to the right" rule, :616-618);
  *   - within a level, windows of exactly mergeFactor adjacent segments
  *     are emitted left to right; a window containing an in-flight
  *     (merging) segment is skipped, a window containing an over-limit
  *     segment (size ≥ maxMergeSize OR docs ≥ maxMergeDocs) is skipped
  *     but still advances (:678-718);
  *   - sizes are delete-calibrated when calibrateSizeByDeletes
  *     (the default): bytes pro-rated by live ratio, docs minus deletes.
  */
object LogMergePolicy {

  /** Index/LogMergePolicy.cs:55 */
  val LevelLogSpan = 0.75
  /** Index/LogMergePolicy.cs:61 */
  val DefaultMergeFactor = 10

  final case class Seg(id: Long, bytes: Long, docCount: Long, delCount: Long = 0L)

  /** `sizeByDocs = false` → LogByteSizeMergePolicy, true → LogDocMergePolicy. */
  final case class Config(
      mergeFactor: Int = DefaultMergeFactor,
      minMergeSize: Long,
      maxMergeSize: Long,
      maxMergeSizeForForcedMerge: Long = Long.MaxValue,
      maxMergeDocs: Long = Int.MaxValue,
      calibrateSizeByDeletes: Boolean = true,
      sizeByDocs: Boolean = false)

  /** LogByteSizeMergePolicy defaults (LogByteSizeMergePolicy.cs:33-45):
    * min 1.6 MB, max 2048 MB, forced-merge size unbounded. */
  def logByteSize: Config = Config(
    minMergeSize = (1.6 * 1024 * 1024).toLong,
    maxMergeSize = 2048L * 1024 * 1024)

  /** LogDocMergePolicy defaults (LogDocMergePolicy.cs:34-46): min 1000
    * docs; by-size limits unbounded (doc limit governs). */
  def logDoc: Config = Config(
    minMergeSize = 1000L,
    maxMergeSize = Long.MaxValue,
    sizeByDocs = true)

  final case class OneMerge(segments: Seq[Seg]) {
    def ids: Seq[Long] = segments.map(_.id)
  }

  /** Size() of the active subclass — bytes (delete-pro-rated) or docs. */
  private def size(s: Seg, cfg: Config): Long =
    if (cfg.sizeByDocs) sizeDocs(s, cfg)
    else if (!cfg.calibrateSizeByDeletes || s.docCount <= 0) s.bytes
    else (s.bytes * (1.0 - s.delCount.toDouble / s.docCount.toDouble)).toLong

  /** SizeDocs() — always doc-based (both limits are checked). */
  private def sizeDocs(s: Seg, cfg: Config): Long =
    if (cfg.calibrateSizeByDeletes) s.docCount - s.delCount else s.docCount

  /** IsMerged analog for one segment: nothing left to fold in. */
  private def isMerged(s: Seg): Boolean = s.delCount == 0

  /** FindMerges (LogMergePolicy.cs:562-726): quantize log-sizes into
    * levels, emit every full mergeFactor window per level. `merging` =
    * ids currently being merged by the scheduler (their windows skip). */
  def findMerges(segments: Seq[Seg], cfg: Config,
                 merging: Set[Long] = Set.empty): Seq[OneMerge] = {
    val n = segments.length
    val norm = math.log(cfg.mergeFactor).toFloat
    val levels: Array[Float] = segments.map { s =>
      val sz = math.max(1L, size(s, cfg))
      (math.log(sz.toDouble).toFloat / norm)
    }.toArray
    val levelFloor: Float =
      if (cfg.minMergeSize <= 0) 0.0f
      else (math.log(cfg.minMergeSize.toDouble) / norm).toFloat

    val spec = ArrayBuffer.empty[OneMerge]
    var start = 0
    while (start < n) {
      var maxLevel = levels(start)
      var i = start + 1
      while (i < n) { if (levels(i) > maxLevel) maxLevel = levels(i); i += 1 }

      val levelBottom: Float =
        if (maxLevel <= levelFloor) -1.0f
        else {
          val lb = maxLevel - LevelLogSpan.toFloat
          if (lb < levelFloor && maxLevel >= levelFloor) levelFloor else lb
        }

      var upto = n - 1
      while (upto >= start && levels(upto) < levelBottom) upto -= 1

      var s0 = start
      var end = s0 + cfg.mergeFactor
      while (end <= 1 + upto) {
        var anyTooLarge = false
        var anyMerging = false
        var k = s0
        while (k < end && !anyMerging) {
          val info = segments(k)
          anyTooLarge |= size(info, cfg) >= cfg.maxMergeSize ||
            sizeDocs(info, cfg) >= cfg.maxMergeDocs
          if (merging.contains(info.id)) anyMerging = true
          k += 1
        }
        if (!anyMerging && !anyTooLarge)
          spec += OneMerge(segments.slice(s0, end))
        s0 = end
        end = s0 + cfg.mergeFactor
      }
      start = 1 + upto
    }
    spec.toSeq
  }

  /** FindForcedDeletesMerges (:468-533): merge adjacent runs of segments
    * carrying deletes, mergeFactor at a time. */
  def findForcedDeletesMerges(segments: Seq[Seg], cfg: Config): Seq[OneMerge] = {
    val spec = ArrayBuffer.empty[OneMerge]
    var first = -1
    var i = 0
    while (i < segments.length) {
      if (segments(i).delCount > 0) {
        if (first == -1) first = i
        else if (i - first == cfg.mergeFactor) {
          spec += OneMerge(segments.slice(first, i)); first = i
        }
      } else if (first != -1) {
        spec += OneMerge(segments.slice(first, i)); first = -1
      }
      i += 1
    }
    if (first != -1) spec += OneMerge(segments.slice(first, segments.length))
    spec.toSeq
  }

  /** FindForcedMerges (:375-461): merge down toward `maxNumSegments`.
    * All segments are assumed to-merge (the segmentsToMerge map covers
    * the index — the ForceMerge(n) case). Size-limited when any segment
    * exceeds maxMergeSizeForForcedMerge/maxMergeDocs, else the exact
    * maxNumSegments planner. */
  def findForcedMerges(segments: Seq[Seg], maxNumSegments: Int,
                       cfg: Config): Seq[OneMerge] = {
    require(maxNumSegments > 0)
    val last = segments.length
    if (last == 0) return Nil
    if (last <= maxNumSegments && (last != 1 || isMerged(segments(0)))) return Nil

    val anyTooLarge = segments.take(last).exists(s =>
      size(s, cfg) > cfg.maxMergeSizeForForcedMerge ||
        sizeDocs(s, cfg) > cfg.maxMergeDocs)

    if (anyTooLarge) forcedSizeLimit(segments, cfg, last)
    else forcedMaxNum(segments, maxNumSegments, cfg, last)
  }

  /** FindForcedMergesSizeLimit (:265-307): right-to-left, skipping
    * over-limit segments, emitting the runs between them. */
  private def forcedSizeLimit(segments: Seq[Seg], cfg: Config,
                              lastIn: Int): Seq[OneMerge] = {
    val spec = ArrayBuffer.empty[OneMerge]
    var last = lastIn
    var start = last - 1
    while (start >= 0) {
      val info = segments(start)
      if (size(info, cfg) > cfg.maxMergeSizeForForcedMerge ||
          sizeDocs(info, cfg) > cfg.maxMergeDocs) {
        if (last - start - 1 > 1 ||
            (start != last - 1 && !isMerged(segments(start + 1))))
          spec += OneMerge(segments.slice(start + 1, last))
        last = start
      } else if (last - start == cfg.mergeFactor) {
        spec += OneMerge(segments.slice(start, last))
        last = start
      }
      start -= 1
    }
    // left-over run, unless it is a single already-merged segment
    if (last > 0) {
      start += 1
      if (start + 1 < last || !isMerged(segments(start)))
        spec += OneMerge(segments.slice(start, last))
    }
    spec.toSeq
  }

  /** FindForcedMergesMaxNumSegments (:314-375): enroll full windows from
    * the right; only with none pending, one least-cost partial merge
    * chosen so the index doesn't go lopsided. */
  private def forcedMaxNum(segments: Seq[Seg], maxNumSegments: Int,
                           cfg: Config, lastIn: Int): Seq[OneMerge] = {
    val spec = ArrayBuffer.empty[OneMerge]
    var last = lastIn
    while (last - maxNumSegments + 1 >= cfg.mergeFactor) {
      spec += OneMerge(segments.slice(last - cfg.mergeFactor, last))
      last -= cfg.mergeFactor
    }
    if (spec.isEmpty) {
      if (maxNumSegments == 1) {
        if (last > 1 || !isMerged(segments(0)))
          spec += OneMerge(segments.slice(0, last))
      } else if (last > maxNumSegments) {
        val finalMergeSize = last - maxNumSegments + 1
        var bestSize = 0L
        var bestStart = 0
        var i = 0
        while (i < last - finalMergeSize + 1) {
          var sumSize = 0L
          var jj = 0
          while (jj < finalMergeSize) { sumSize += size(segments(jj + i), cfg); jj += 1 }
          if (i == 0 ||
              (sumSize < 2 * size(segments(i - 1), cfg) && sumSize < bestSize)) {
            bestStart = i; bestSize = sumSize
          }
          i += 1
        }
        spec += OneMerge(segments.slice(bestStart, bestStart + finalMergeSize))
      }
    }
    spec.toSeq
  }
}
