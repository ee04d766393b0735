package graft.build

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dense ids for a distinct key set in global sort order, built the way
  * the index assigns docIds (range-partition + in-partition sort +
  * per-partition offset rebase — see [[DocsTable]]): value-identical to
  * `dense_rank() OVER (ORDER BY key)` but with no single-partition
  * WindowExec and no driver-side collect of the keys themselves (only
  * one count per partition reaches the driver). */
object DenseIds {

  /** (keyCol, idCol) with ids dense from `base` in ascending key order. */
  def assign(keys: DataFrame, keyCol: String, idCol: String,
             numPartitions: Int = 32, base: Long = 1L): DataFrame =
    rank(keys.select(col(keyCol)).distinct(), Seq(keyCol), idCol,
      numPartitions, base)

  /** The shared core: dense global sort rank over `sortCols`, every
    * input column carried through, `idCol` appended — used by [[assign]]
    * (distinct single-key dictionaries) and IndexSorter.sortBy (the
    * (sortField, oldId) docId remap). Input rows must be distinct in
    * `sortCols` (ties would get arbitrary but distinct ranks). */
  def rank(rows: DataFrame, sortCols: Seq[String], idCol: String,
           numPartitions: Int = 32, base: Long = 1L): DataFrame = {
    val reserved = Seq("mid", "pid", "localIdx", "offset")
    require(rows.columns.forall(c => !reserved.contains(c)),
      s"input columns collide with rank internals: ${reserved.mkString(",")}")
    val carried = rows.columns.toSeq.map(col)
    val sorted = rows
      .repartitionByRange(numPartitions, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      // monotonically_increasing_id = pid << 33 | local ordinal; range
      // partitions carry ascending key ranges, so cumulative offsets in
      // pid order reproduce the global sort rank
      .select(carried :+ monotonically_increasing_id().as("mid"): _*)
      .select(carried :+ shiftright(col("mid"), 33).cast("int").as("pid")
        :+ col("mid").bitwiseAND((1L << 33) - 1).as("localIdx"): _*)
      // the per-partition count action below and the caller's consumption
      // would otherwise each run the distinct+sort lineage; the dictionary
      // is key-cardinality-sized, so caching it is the cheaper trade
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.groupBy(col("pid")).agg(count("*").as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var off = base
    val offsets = counts.map { case (pid, n) => val o = (pid, off); off += n; o }
    val offDf = rows.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("pid", "offset")
    // Materialize the final mapping (lineage-free, eager) and release the
    // cached dictionary NOW rather than leaving it to ContextCleaner GC —
    // repeated assign calls in one session (every dedup/fingerprint query,
    // every expunge) would otherwise stack cached RDDs. The checkpoint
    // blocks themselves are key-cardinality-sized and are reclaimed as
    // soon as the caller's reference drops. Known trade: localCheckpoint
    // blocks are executor-local, so on a cluster with executor churn a
    // lost block fails the consuming job instead of recomputing — set a
    // reliable spark.checkpoint.dir and swap to checkpoint() in such
    // deployments; the lineage-backed alternative was the cache-leak this
    // replaces.
    val result = sorted.join(broadcast(offDf), Seq("pid"))
      .select(carried :+ (col("offset") + col("localIdx")).as(idCol): _*)
      .localCheckpoint(true)
    sorted.unpersist(blocking = false)
    result
  }
}
