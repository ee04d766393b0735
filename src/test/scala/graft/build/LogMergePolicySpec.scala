package graft.build

import graft.SparkTestSession
import graft.corpus.CorpusGen
import graft.search.{IndexReader, Searcher, TermQ}
import graft.streaming.StreamingIndexer
import org.scalatest.funsuite.AnyFunSuite

/** LogMergePolicy (Index/LogMergePolicy.cs + LogDoc/LogByteSize
  * subclasses): the level-quantization selection math hand-traced on
  * synthetic segment stats — adjacency, the right-extension rule, floor
  * collapse, window skips, all three forced planners — then the
  * maintenance loop over real streaming generations. */
class LogMergePolicySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import LogMergePolicy._

  // doc-sized policy with a 1-doc floor: toy doc counts map to exact levels
  private def docCfg(mf: Int = 10, minMerge: Long = 1L,
                     maxMergeDocs: Long = Int.MaxValue) =
    Config(mergeFactor = mf, minMergeSize = minMerge,
      maxMergeSize = Long.MaxValue, maxMergeDocs = maxMergeDocs,
      sizeByDocs = true)

  private def seg(id: Long, docs: Long, dels: Long = 0L) =
    Seg(id, bytes = docs * 100, docCount = docs, delCount = dels)

  test("mergeFactor equal segments merge as one ADJACENT window") {
    val merges = findMerges((0L until 10L).map(seg(_, 1000)), docCfg())
    assert(merges.length === 1)
    assert(merges.head.ids === (0L until 10L)) // index order, adjacent
  }

  test("level separation: the big segment's level excludes it") {
    // log10(1e6)=6 vs log10(1000)=3: the big seg is its own level
    val segs = seg(99, 1000000) +: (0L until 10L).map(seg(_, 1000))
    val merges = findMerges(segs, docCfg())
    assert(merges.length === 1 && merges.head.ids === (0L until 10L))
  }

  test("right-extension: an interleaved small segment is pulled UP a level, never reordered") {
    // [big, small, big, 8 smalls]: the level of the bigs extends right to
    // index 2, capturing the small at index 1 — so neither it nor the
    // bigs can merge with the right-hand smalls (only 8 remain < 10)
    val segs = Seq(seg(100, 1000000), seg(50, 1000), seg(101, 1000000)) ++
      (0L until 8L).map(seg(_, 1000))
    assert(findMerges(segs, docCfg()) === Nil)
  }

  test("level floor: everything below minMergeSize collapses into ONE level") {
    // wildly different tiny sizes (2..900 docs) all < minMergeSize=1000:
    // one bottom level, one adjacent window in index order
    val sizes = Seq(2L, 900L, 30L, 500L, 7L, 250L, 80L, 600L, 15L, 400L)
    val segs = sizes.zipWithIndex.map { case (d, i) => seg(i.toLong, d) }
    val merges = findMerges(segs, docCfg(minMerge = 1000L))
    assert(merges.length === 1 && merges.head.ids === (0L until 10L))
  }

  test("a window containing an over-maxMergeDocs segment is skipped but still advances") {
    // seg 0 has 2000 docs ≥ maxMergeDocs=1500 (level 3.3, bottom 2.55
    // still spans the 1000-doc segs) → window [0,10) skipped, [10,20) merges
    val segs = seg(0, 2000) +: (1L until 20L).map(seg(_, 1000))
    val merges = findMerges(segs, docCfg(maxMergeDocs = 1500))
    assert(merges.length === 1 && merges.head.ids === (10L until 20L))
  }

  test("a window containing an in-flight segment is skipped") {
    val segs = (0L until 20L).map(seg(_, 1000))
    val merges = findMerges(segs, docCfg(), merging = Set(3L))
    assert(merges.length === 1 && merges.head.ids === (10L until 20L))
  }

  test("forced-deletes merges: adjacent delete runs, mergeFactor at a time") {
    val dels = Seq(0L, 5L, 5L, 5L, 0L, 5L)
    val segs = dels.zipWithIndex.map { case (d, i) => seg(i.toLong, 1000, d) }
    val merges = findForcedDeletesMerges(segs, docCfg(mf = 2))
    assert(merges.map(_.ids) === Seq(Seq(1L, 2L), Seq(3L), Seq(5L)))
  }

  test("forceMerge(1): full windows enroll right to left, no partial while any pending") {
    val segs = (0L until 23L).map(seg(_, 1000))
    val merges = findForcedMerges(segs, maxNumSegments = 1, docCfg())
    assert(merges.map(_.ids) === Seq((13L until 23L).toSeq, (3L until 13L).toSeq))
  }

  test("forceMerge(n) partial: least-cost start that keeps the index balanced") {
    // sizes [100,10,10,10,100], n=3 → finalMergeSize=3; start 1 sums 30
    // and is < 2×its left neighbor (200) → merge the middle run
    val sizes = Seq(100L, 10L, 10L, 10L, 100L)
    val segs = sizes.zipWithIndex.map { case (d, i) => seg(i.toLong, d) }
    val merges = findForcedMerges(segs, maxNumSegments = 3, docCfg())
    assert(merges.map(_.ids) === Seq(Seq(1L, 2L, 3L)))
  }

  test("forceMerge with size limit: over-limit segments are skipped, their right side merged") {
    val segs = Seq(seg(0, 5000), seg(1, 10), seg(2, 10), seg(3, 10))
    val cfg = docCfg().copy(maxMergeSizeForForcedMerge = 1000L)
    val merges = findForcedMerges(segs, maxNumSegments = 1, cfg)
    assert(merges.map(_.ids) === Seq(Seq(1L, 2L, 3L)))
  }

  test("already down to maxNumSegments: no merges") {
    assert(findForcedMerges((0L until 3L).map(seg(_, 1000)),
      maxNumSegments = 3, docCfg()) === Nil)
  }

  test("maintainLog: adjacent generations merge in place, search answers unchanged") {
    import spark.implicits._
    val root = SparkTestSession.tmpDir("graft-logmerge-")
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
    val merged = StreamingIndexer.maintainLog(spark, root,
      Config(mergeFactor = 10, minMergeSize = 1L,
        maxMergeSize = Long.MaxValue, sizeByDocs = true))
    // Log policy: the window is the LOWEST ten ADJACENT generation ids
    assert(merged === Seq((0L until 10L).toSeq))
    val gens = StreamingIndexer.generations(spark, root)
    assert(gens.sorted === Seq(0L, 10L, 11L))
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
