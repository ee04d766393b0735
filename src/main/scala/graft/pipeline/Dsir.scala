package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
  * arXiv:2302.03169, public): score every raw-corpus document by how
  * target-like it is under two bag-of-hashed-n-gram models, then keep the
  * top-weighted (the paper resamples with Gumbel noise; the deterministic
  * top-k variant it also evaluates is what a reproducible pipeline runs).
  *
  *   log w(doc) = Σ_f c_f(doc) · [ ln p̂_target(f) − ln p̂_raw(f) ]
  *
  * with f ranging over hashed unigram+bigram buckets and p̂ the
  * add-alpha-smoothed bucket frequencies.
  *
  * 100 TB shape: one corpus-sized pass explodes features (map-only), one
  * combinable groupBy builds the per-bucket census (`buckets` rows — the
  * model is TINY), the log-ratio table broadcasts onto the per-doc bucket
  * counts (a second combinable groupBy keyed by doc), so the whole job is
  * two map-side-combined shuffles and a broadcast — no corpus-sized join,
  * no window, no driver materialization beyond the B-row model. Bucket
  * ids ride the dense parity dictionary (see Dedup.denseIds) so an
  * independent engine reproduces them bit-for-bit; a production run would
  * swap the dictionary for xxhash64 like the fingerprint prod path. */
object Dsir {

  /** Per-doc importance weights. `isTarget` marks the target-domain
    * sample inside `docs` (the paper's D_target; raw = ALL of `docs`). */
  def importanceWeights(docs: DataFrame, isTarget: Column,
                        buckets: Int = 64, alpha: Double = 0.5): DataFrame = {
    require(buckets > 0 && alpha > 0, "buckets > 0, alpha > 0")
    val ts = Dedup.tokensCol("text")
    val n = size(ts)
    val bigrams = when(n >= 2,
      zip_with(slice(ts, lit(1), n - 1), slice(ts, lit(2), n - 1),
        (a, b) => concat_ws(" ", a, b)))
      .otherwise(array().cast("array<string>"))
    val feats = docs
      .select(col("doc_id"), isTarget.as("tgt"),
        explode(concat(ts, bigrams)).as("f"))
    val dict = Dedup.denseIds(feats, "f", "sid")
    val fb = feats.join(dict, "f")
      .select(col("doc_id"), col("tgt"),
        ((col("sid") * 131 + 7) % buckets).as("b"))
    // bucket census over raw (= all docs) and the target slice: B rows,
    // checkpointed so the corpus pass runs once (totals + ratio read it)
    val census = fb.groupBy(col("b")).agg(
      count(lit(1)).as("cr"),
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"))
      .localCheckpoint()
    // grand totals are two driver scalars (stats-sized, like the k-means
    // codebook inline) — folding them as literals keeps the ratio table a
    // pure projection instead of a census×totals nested-loop join
    val totRow = census.agg(sum(col("cr")), sum(col("ct"))).head()
    require(!totRow.isNullAt(0), "DSIR: empty corpus (no features)")
    val (tr, tt) = (totRow.getLong(0), totRow.getLong(1))
    val ratio = census.select(col("b"),
      (log((col("ct") + alpha) / (tt + alpha * buckets))
        - log((col("cr") + alpha) / (tr + alpha * buckets))).as("lr"))
    val perDoc = fb.groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    perDoc.join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_feats"),
        round(sum(col("c") * col("lr")), 6).as("dsir_w"))
  }
}
