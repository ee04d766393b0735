package graft.props

import graft.build.LogMergePolicy
import graft.build.LogMergePolicy.{Config, Seg, findMerges, findForcedMerges, findForcedDeletesMerges}
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Randomized theorems for LogMergePolicy: the invariants the reference
  * guarantees by construction (Index/LogMergePolicy.cs FindMerges), checked
  * over arbitrary segment lists. These are the properties the streaming
  * maintenance loop relies on when it executes merges in place. */
object MergePolicyProps extends Properties("LogMergePolicy") {

  private val segsGen: Gen[Seq[Seg]] = for {
    n <- Gen.chooseNum(0, 40)
    docs <- Gen.listOfN(n, Gen.chooseNum(1L, 2000000L))
    dels <- Gen.listOfN(n, Gen.chooseNum(0L, 50L))
  } yield docs.zip(dels).zipWithIndex.map { case ((d, del), i) =>
    Seg(i.toLong, bytes = d * 100, docCount = d, delCount = math.min(del, d))
  }

  private val cfgGen: Gen[Config] = for {
    mf <- Gen.chooseNum(2, 10)
    minMerge <- Gen.oneOf(1L, 1000L, 100000L)
    maxDocs <- Gen.oneOf(Long.MaxValue, 1500000L)
  } yield Config(mergeFactor = mf, minMergeSize = minMerge,
    maxMergeSize = Long.MaxValue, maxMergeDocs = maxDocs, sizeByDocs = true)

  property("every merge is an ADJACENT id run of exactly mergeFactor") =
    forAll(segsGen, cfgGen) { (segs, cfg) =>
      findMerges(segs, cfg).forall { m =>
        m.ids.length == cfg.mergeFactor &&
          m.ids == (m.ids.head until m.ids.head + cfg.mergeFactor)
      }
    }

  property("merges never overlap and never contain an over-limit or in-flight segment") =
    forAll(segsGen, cfgGen) { (segs, cfg) =>
      val merging: Set[Long] = segs.take(3).map(_.id).toSet
      val ms = findMerges(segs, cfg, merging)
      val all = ms.flatMap(_.ids)
      all.distinct.length == all.length &&
        ms.forall(_.segments.forall(s =>
          (s.docCount - s.delCount) < cfg.maxMergeDocs &&
            !merging.contains(s.id)))
    }

  property("selection is a pure function (same input, same merges)") =
    forAll(segsGen, cfgGen) { (segs, cfg) =>
      findMerges(segs, cfg) == findMerges(segs, cfg)
    }

  property("forceMerge(n): abstractly executing re-planned rounds reaches ≤ n segments") =
    forAll(segsGen, Gen.chooseNum(1, 5), Gen.chooseNum(2, 10)) { (segs, n, mf) =>
      // unconstrained config — the exact maxNumSegments planner applies
      val cfg = Config(mergeFactor = mf, minMergeSize = 1L,
        maxMergeSize = Long.MaxValue, sizeByDocs = true)
      // each round: every planned merge collapses its run to one segment
      // (delCount folds to 0 — expunge), then the policy re-plans, the
      // way the scheduler re-invokes it after executing a round
      var cur = segs
      var rounds = 0
      while (rounds < 30 && {
        val ms = findForcedMerges(cur, n, cfg)
        if (ms.isEmpty) false
        else {
          val taken = ms.flatMap(_.ids).toSet
          val replaced = ms.map(m => m.segments.head.copy(
            docCount = m.segments.map(_.docCount).sum,
            bytes = m.segments.map(_.bytes).sum,
            delCount = 0L))
          cur = (cur.filterNot(s => taken.contains(s.id)) ++ replaced)
            .sortBy(_.id)
          true
        }
      }) rounds += 1
      cur.isEmpty || cur.length <= n
    }

  property("forced-deletes merges cover EVERY delete-bearing segment, and only those runs") =
    forAll(segsGen, cfgGen) { (segs, cfg) =>
      val ms = findForcedDeletesMerges(segs, cfg)
      val mergedIds = ms.flatMap(_.ids).toSet
      val withDels = segs.filter(_.delCount > 0).map(_.id).toSet
      // every segment with deletes is in some merge; clean segments appear
      // only as interior members of... never: runs break at clean segments
      withDels.subsetOf(mergedIds) &&
        ms.forall(_.segments.forall(_.delCount > 0))
    }
}
