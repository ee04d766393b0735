package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dataset-assembly operators a training pipeline runs after filtering:
  * deterministic train/validation splits and token-budget sequence
  * packing (assigning documents to fixed-token-budget context windows).
  * Both are reproducible from the data alone — no RNG state, no driver
  * bookkeeping — so re-runs and independent engines agree exactly. */
object Packing {

  /** Deterministic content-hash split: a doc goes to 'val' iff the first
    * hex digit of md5(text) falls in `valDigits` (k digits ⇒ k/16 of the
    * corpus, stable under any reordering or re-partitioning). The
    * standard leakage-safe alternative to random splits — identical
    * content always lands on the same side. */
  def deterministicSplit(docs: DataFrame,
                         valDigits: Seq[String] = Seq("0", "1")): DataFrame =
    docs.select(col("doc_id"),
      when(substring(md5(col("text")), 1, 1).isin(valDigits: _*), "val")
        .otherwise("train").as("split"))

  /** Token-budget window packing: documents in doc_id order fill
    * fixed-budget context windows; a doc belongs to the window in which
    * it STARTS (window_id = exclusive-prefix-sum(tokens) div budget).
    * The prefix sum is computed scale-shaped — range-partition by
    * doc_id, a PARTITIONED running-sum window within each partition,
    * plus tiny per-partition totals rebased on the driver (the DenseIds
    * offset pattern) — no single-partition global window anywhere, so
    * the op survives any corpus size. */
  def packIntoWindows(docs: DataFrame, budgetTokens: Long,
                      numPartitions: Int = 32): DataFrame = {
    val spark = docs.sparkSession
    val parted = docs
      .select(col("doc_id"),
        size(Dedup.tokensCol("text")).cast("long").as("n_tokens"))
      .repartitionByRange(numPartitions, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .select(col("doc_id"), col("n_tokens"), spark_partition_id().as("pid"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = parted.withColumn("localPrefix",
      coalesce(sum(col("n_tokens")).over(w), lit(0L)))
    // per-partition token totals → cumulative offsets (partition count
    // rows on the driver — the same tiny commit DenseIds does; the eager
    // localCheckpoint below shares DenseIds' documented executor-churn
    // trade)
    val counts = parted.groupBy(col("pid")).agg(sum(col("n_tokens")).as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var off = 0L
    val offsets = counts.map { case (pid, t) => val o = (pid, off); off += t; o }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "offset")
    val result = local.join(broadcast(offDf), Seq("pid"))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"(offset + localPrefix) div ${budgetTokens}L").as("window_id"))
      .localCheckpoint(true)
    parted.unpersist(blocking = false)
    result
  }

  /** Deterministic domain-mixture sampling: realize per-domain keep rates
    * (the "data mixture weights" step of every LLM corpus recipe) with a
    * doc-stable residue test instead of an RNG — `mix(doc_id) < rate_ppm`
    * where `mix = ((doc_id % 1000003) * 2654435761) % 1_000_000`. Rates
    * are integer parts-per-million so the threshold compare is exact in
    * any engine (no float-cast rounding divergence). Reproducible across
    * runs, re-partitionings and engines; map-only (the filter pushes to
    * the scan); domains absent from `ratesPpm` keep `defaultPpm`.
    * The inner modulus bounds the product at ~2.7e15, so the arithmetic
    * never overflows a signed 64-bit int at any doc_id. */
  def mixtureSample(docs: DataFrame, domainCol: String,
                    ratesPpm: Map[String, Long],
                    defaultPpm: Long = 1000000L): DataFrame = {
    val rate = ratesPpm.foldLeft(lit(defaultPpm)) { case (acc, (d, r)) =>
      when(col(domainCol) === d, lit(r)).otherwise(acc)
    }
    docs.where(((col("doc_id") % 1000003L) * 2654435761L) % 1000000L < rate)
  }

  /** Sliding-window chunking for long-document training prep: each doc
    * splits into context windows of `w` tokens starting every `stride`
    * tokens (starts 0, stride, 2·stride, … < dl — the last window may be
    * short; stride < w ⇒ overlapping windows, the standard "don't lose
    * the suffix" chunking). Returns per-doc chunk stats
    * (dl, n_chunks, covered = Σ window lengths; covered > dl measures
    * the overlap duplication factor a token-budget planner needs).
    * Pure per-row expressions — the window walk folds inside
    * `aggregate(sequence(…))`, so there is NO explode and NO shuffle:
    * a map-only projection at any corpus size. */
  def chunkStats(docs: DataFrame, w: Int = 8, stride: Int = 6): DataFrame = {
    require(w > 0 && stride > 0, "w > 0, stride > 0")
    val starts = sequence(lit(0L), col("dl") - 1, lit(stride.toLong))
    docs.select(col("doc_id"),
        size(Dedup.tokensCol("text")).cast("long").as("dl"))
      .where(col("dl") > 0)
      .select(col("doc_id"), col("dl"),
        size(starts).cast("long").as("n_chunks"),
        aggregate(starts, lit(0L),
          (acc, st) => acc + least(lit(w.toLong), col("dl") - st)).as("covered"))
  }
}
