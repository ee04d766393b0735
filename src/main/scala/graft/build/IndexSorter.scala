package graft.build

import graft.postings.PostingsCodec
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorted indexes + early-terminating top-k (reference:
  * /root/reference/src/Lucene.Net.Misc/Index/Sorter/SortingMergePolicy.cs,
  * SortingAtomicReader.cs, EarlyTerminatingSortingCollector.cs): rewrite
  * the index with docIds REASSIGNED in sort-field order, so any query
  * whose sort matches the index sort can stop after the first k hits —
  * the time-sorted-logs / price-sorted-catalog access pattern.
  *
  * Spark-native restatement:
  *   - [[sortBy]] builds an (oldId → newId) remap dense in
  *     (sortField, oldId) order — the same range-partition + offset-rebase
  *     technique as [[DenseIds]], no single-partition window — and runs it
  *     through the shared segment rewrite ([[Deletes.rewriteWithRemap]]).
  *     The rewrite range-shuffles postings by (term, newId), so each
  *     term's blocks land in ascending, DISJOINT newId ranges across
  *     segments — the invariant early termination needs.
  *   - [[earlyTopK]] is the EarlyTerminatingSortingCollector: fetch one
  *     term's block METADATA (rows, not blobs — a per-term stats-sized
  *     driver pull), keep the shortest firstDocId-ascending prefix whose
  *     cumulative numDocs ≥ k, and decode ONLY those blocks. At 10^9 docs
  *     a hot term's thousands of blocks shrink to ⌈k/128⌉ decodes; the
  *     parquet scan itself prunes on the pushed firstDocId list.
  */
object IndexSorter {

  /** Rewrite `dir` with docIds dense in (`sortField` asc, docId asc)
    * order; `sortField` is a docstats column (e.g. tokenCount) or any
    * column of a caller-joined doc table. Tombstones are folded (merge
    * semantics), docvalue updates applied — same as expunge. */
  def sortBy(spark: SparkSession, dir: String, outDir: String,
             sortField: String, numPartitions: Int = 8): Unit = {
    import spark.implicits._
    val dead = Deletes.tombstones(spark, dir).toDF("deadId").distinct()
    val keys = DocValues.readDocstats(spark, dir)
      .join(dead, col("docId") === col("deadId"), "left_anti")
      .select(col(sortField).as("sk"), col("docId").as("oldId"))
    // dense rank in (sk, oldId) order without a global window: range
    // partitions carry ascending (sk, oldId) ranges, so per-partition
    // offsets rebased in pid order reproduce the global sort rank
    val sorted = keys
      .repartitionByRange(numPartitions, $"sk", $"oldId")
      .sortWithinPartitions($"sk", $"oldId")
      .select($"oldId", monotonically_increasing_id().as("mid"))
      .select($"oldId", shiftright($"mid", 33).cast("int").as("pid"),
        $"mid".bitwiseAND((1L << 33) - 1).as("localIdx"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.groupBy($"pid").agg(count("*").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var off = 0L
    val offsets = counts.map { case (pid, n) => val o = (pid, off); off += n; o }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val remap = sorted.join(broadcast(offDf), Seq("pid"))
      .select($"oldId", ($"offset" + $"localIdx").as("newId"))
      .localCheckpoint(true)
    sorted.unpersist(blocking = false)
    Deletes.rewriteWithRemap(spark, dir, outDir, remap, numPartitions)
  }

  /** First `k` docs containing `term` in index-sort order, decoding only
    * the leading blocks (EarlyTerminatingSortingCollector). Requires a
    * [[sortBy]]-rewritten index (per-term blocks cover disjoint ascending
    * docId ranges). Returns (docId, tf) rows, docId ascending, ≤ k. */
  def earlyTopK(spark: SparkSession, dir: String, term: String, k: Int): DataFrame = {
    import spark.implicits._
    val meta = spark.read.parquet(IndexPaths.postings(dir))
      .where($"term" === term)
      .select($"firstDocId", $"numDocs")
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1)
    var need = k
    val keep = meta.takeWhile { case (_, n) =>
      val take = need > 0; need -= n; take
    }.map(_._1)
    spark.read.parquet(IndexPaths.postings(dir))
      .where($"term" === term && $"firstDocId".isin(keep.toIndexedSeq: _*))
      .select($"term", $"firstDocId", $"lastDocId", $"numDocs", $"maxTf",
        $"maxNorm", $"sumTf", $"segId", $"bytes").as[PostingRow]
      .flatMap { r =>
        val (ids, tfs, _) = PostingsCodec.decodeBlock(r.firstDocId, r.numDocs, r.bytes)
        ids.indices.map(i => (ids(i), tfs(i)))
      }.toDF("docId", "tf")
      .orderBy($"docId").limit(k)
  }
}
