package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import graft.search.{IndexReader, Searcher, TermQ}
import graft.streaming.StreamingIndexer
import org.scalatest.funsuite.AnyFunSuite

/** TieredMergePolicy (Index/TieredMergePolicy.cs): the selection math
  * hand-traced on synthetic segment stats, then the maintenance loop
  * executing chosen merges over real streaming generations. */
class TieredMergePolicySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import TieredMergePolicy.{Config, Seg, findMerges}

  private val MB = 1024L * 1024

  // floor=1 byte so toy sizes aren't all flattened to the 2MB floor
  private def cfg(maxMergeAtOnce: Int = 10, segsPerTier: Double = 10.0,
                  maxMerged: Long = 5L * 1024 * MB) =
    Config(maxMergeAtOnce, segsPerTier, maxMerged, floorSegmentBytes = 1L)

  test("20 equal segments: budget 11 allows ONE merge of 10, then stops") {
    val segs = (0L until 20L).map(Seg(_, 10 * MB, 100))
    val merges = findMerges(segs, Set.empty, cfg())
    // tot=200MB, level1 grants 10 at 10MB, then 100MB/100MB=1 → budget 11;
    // 20 ≥ 11 → merge 10; 10 remaining < 11 → done
    assert(merges.length === 1 && merges.head.segments.length === 10)
  }

  test("skew: the lopsided window loses to the balanced one") {
    val segs = Seg(99L, 100 * MB, 100) +: (0L until 19L).map(Seg(_, 10 * MB, 100))
    val merges = findMerges(segs, Set.empty, cfg())
    // a window containing the 100MB seg has skew ~0.53 vs 0.1 for ten
    // equal 10MB segs — the big segment must not be merged
    assert(merges.nonEmpty && merges.forall(!_.ids.contains(99L)))
  }

  test("too-big segments are graced out and never merged") {
    val segs = Seg(99L, 60 * MB, 100) +: (0L until 20L).map(Seg(_, 1 * MB, 100))
    val merges = findMerges(segs, Set.empty, cfg(maxMerged = 100 * MB))
    // 60MB ≥ maxMerged/2: out of the budget and out of every candidate
    assert(merges.nonEmpty && merges.forall(!_.ids.contains(99L)))
  }

  test("packing: a segment that would bust maxMergedSegmentBytes is skipped, smaller packed") {
    // sizes desc: 40,30,8x5; maxMerged=50: window at start0 takes 40,
    // skips 30 (70>50), packs 5s up to 50 → candidate {40, 5, 5}
    val segs = Seq(Seg(0, 40 * MB, 100), Seg(1, 30 * MB, 100)) ++
      (2L until 10L).map(Seg(_, 5 * MB, 100))
    val merges = findMerges(segs, Set.empty,
      cfg(maxMergeAtOnce = 3, segsPerTier = 2.0, maxMerged = 50 * MB))
    assert(merges.nonEmpty)
    val first = merges.head.ids.toSet
    assert(!(first.contains(0L) && first.contains(1L)),
      s"40+30 > maxMerged must never merge together: $first")
  }

  test("reclaimDeletesWeight: the delete-heavy window wins at equal live size") {
    // group A: 10MB with 50% deleted (live 5MB, nonDelRatio 0.5);
    // group B: 5MB clean (live 5MB, nonDelRatio 1.0). Equal skew and
    // size → A's score × 0.5^2 → A merges first.
    val a = (0L until 10L).map(Seg(_, 10 * MB, 100, 50))
    val b = (10L until 20L).map(Seg(_, 5 * MB, 100, 0))
    val merges = findMerges(a ++ b, Set.empty, cfg())
    assert(merges.nonEmpty && merges.head.ids.forall(_ < 10L),
      s"delete-reclaiming merge must win: ${merges.head.ids}")
  }

  test("under budget: no merges") {
    assert(findMerges((0L until 5L).map(Seg(_, 10 * MB, 100)),
      Set.empty, cfg()) === Nil)
  }

  test("maintainTiered: generations merge in place, search answers unchanged") {
    import spark.implicits._
    val root = SparkTestSession.tmpDir("graft-tiered-")
    val docs = CorpusGen.local(60)
    docs.grouped(5).zipWithIndex.foreach { case (chunk, i) =>
      StreamingIndexer.appendBatch(spark, spark.createDataset(chunk), root,
        batchId = i.toLong, numPartitions = 2)
    }
    assert(StreamingIndexer.generations(spark, root).length === 12)
    def search(k: Int) = new Searcher(IndexReader.multi(spark,
      StreamingIndexer.generations(spark, root)
        .map(StreamingIndexer.genDir(root, _)))).search(TermQ("def"), k).toSeq
    val before = search(90)
    val merged = StreamingIndexer.maintainTiered(spark, root,
      TieredMergePolicy.Config(floorSegmentBytes = 1L))
    assert(merged.nonEmpty && merged.head.length === 10)
    val gens = StreamingIndexer.generations(spark, root)
    assert(gens.length === 3, s"12 gens → one 10-merge + 2: $gens")
    // the merged generation keeps every swallowed doc exactly once under
    // its GLOBAL id (ranges may be non-contiguous — the policy merges by
    // size order, not id order; the multi-gen union is what must stay
    // dense), stats aggregate, and the union answers bit-equally
    import spark.implicits._
    val allIds = gens.flatMap { g =>
      spark.read.parquet(
        IndexPaths.docstats(StreamingIndexer.genDir(root, g)))
        .select($"docId").as[Long].collect()
    }.sorted
    assert(allIds === (0L until 60L))
    assert(search(90) === before)
  }
}
