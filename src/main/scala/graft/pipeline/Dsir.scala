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
  * 100 TB shape: ONE corpus-sized pass explodes features (map-only) into
  * a combinable groupBy keyed (doc, bucket) — the checkpointed per-doc
  * bucket table, ≤ docs×B rows. The bucket census (B rows — the model is
  * TINY) DERIVES from that table, never re-reading the corpus, and the
  * log-ratio table broadcasts back onto it for the final doc-keyed
  * fold — so the whole job is one corpus shuffle, two stats-sized
  * aggregations and a broadcast: no corpus-sized join, no window, no
  * driver materialization beyond the B-row model. Bucket
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
    // ONE corpus-sized pass: the per-(doc, bucket) counts — then the
    // bucket census DERIVES from them (cr = Σ c per bucket), so nothing
    // downstream re-runs the explode+dictionary lineage. What's
    // checkpointed is the ≤ docs×buckets row table, not corpus-sized fb.
    // tgt rides the grouping key (functionally dependent on doc_id).
    val perDoc = fb.groupBy(col("doc_id"), col("tgt"), col("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()
    val census = perDoc.groupBy(col("b")).agg(
      sum(col("c")).as("cr"),
      sum(when(col("tgt"), col("c")).otherwise(0L)).as("ct"))
    // grand totals are two driver scalars (stats-sized, like the k-means
    // codebook inline) — folding them as literals keeps the ratio table a
    // pure projection instead of a census×totals nested-loop join
    val totRow = census.agg(sum(col("cr")), sum(col("ct"))).head()
    require(!totRow.isNullAt(0), "DSIR: empty corpus (no features)")
    val (tr, tt) = (totRow.getLong(0), totRow.getLong(1))
    val ratio = census.select(col("b"),
      (log((col("ct") + alpha) / (tt + alpha * buckets))
        - log((col("cr") + alpha) / (tr + alpha * buckets))).as("lr"))
    perDoc.join(broadcast(ratio), "b")
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).cast("long").as("n_feats"),
        round(sum(col("c") * col("lr")), 6).as("dsir_w"))
  }
}
