package graft.pipeline

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Unigram-LM subword tokenizer (Kudo 2018, arXiv:1804.10959 — the
  * SentencePiece unigram model, the other canonical trainer next to BPE):
  * pieces carry independent probabilities, a word's likelihood is the sum
  * over all segmentations of the product of piece probabilities, training
  * is EM over the piece probabilities with periodic pruning, and encoding
  * is the Viterbi (max-probability) segmentation.
  *
  * Spark-first shape, identical to the BPE trainer's: the corpus is
  * touched ONCE ([[Bpe.wordTypes]] — token explode + combinable groupBy →
  * the vocabulary-sized word-TYPE table). Every EM round then runs over
  * word types only: the model (a few-k-piece log-prob map) broadcasts,
  * each word type computes its forward/backward lattice locally and emits
  * per-piece expected counts, ONE map-side-combinable groupBy sums them —
  * nothing corpus-sized moves after the first shuffle. The seed census
  * (all substrings up to [[MaxPieceLen]], frequency-weighted) is the
  * gate surface (`q_unigram_seed`, the BPE-census precedent): it is the
  * one stage where an independent engine can disagree; the EM math and
  * Viterbi tie-breaks are pinned by hand-traced UnigramSpec fixtures.
  *
  * Determinism: seed selection ties break (count desc, piece asc);
  * Viterbi ties prefer the LONGER final piece; pruning ties break
  * (score asc, piece desc) so the kept set is reproducible. The paper
  * prunes by likelihood loss — this trainer prunes by expected count
  * (the common simplification in public reimplementations), documented
  * here because it changes WHICH borderline pieces survive, not the EM
  * update itself. */
object Unigram {

  val MaxPieceLen = 8

  /** Substring seed census over a word-type table `wt(w, n)`: every
    * substring (length ≤ maxLen) of every word type, weighted by word
    * frequency — one map-only two-level expansion + ONE combinable
    * groupBy. (piece, n). The wt-shaped entry exists so [[train]] feeds
    * its CHECKPOINTED type table here instead of re-tokenizing the
    * corpus. */
  def seedCensusOfTypes(wt: DataFrame, maxLen: Int = MaxPieceLen): DataFrame =
    wt
      .select(col("w"), col("n"), explode(sequence(lit(1), length(col("w")))).as("i"))
      .select(col("n"), explode(expr(
        s"transform(sequence(1, least($maxLen, length(w) - i + 1)), l -> substring(w, i, l))"))
        .as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("n"))

  /** [[seedCensusOfTypes]] from the raw corpus (tokenize + type census
    * first). */
  def seedCensus(docs: DataFrame, maxLen: Int = MaxPieceLen): DataFrame =
    seedCensusOfTypes(Bpe.wordTypes(docs), maxLen)

  /** Seed model: top `seedSize` pieces by (count desc, piece asc) UNION
    * every single character (so any word stays segmentable), scores
    * normalized to log-probabilities. */
  def seedVocabOfTypes(wt: DataFrame, seedSize: Int,
                       maxLen: Int = MaxPieceLen): Map[String, Double] = {
    val census = seedCensusOfTypes(wt, maxLen)
    val top = census.orderBy(col("n").desc, col("piece")).limit(seedSize)
    val singles = census.where(length(col("piece")) === 1)
    val picked = top.unionByName(singles).distinct()
      .collect().map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val total = picked.values.sum
    picked.map { case (p, c) => p -> math.log(c / total) }
  }

  /** [[seedVocabOfTypes]] from the raw corpus. */
  def seedVocab(docs: DataFrame, seedSize: Int,
                maxLen: Int = MaxPieceLen): Map[String, Double] =
    seedVocabOfTypes(Bpe.wordTypes(docs), seedSize, maxLen)

  private def logSumExp(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else { val m = math.max(a, b); m + math.log(math.exp(a - m) + math.exp(b - m)) }

  /** Expected piece counts for ONE word under the model — the exact
    * E-step lattice: fwd(i) = logP(prefix i), bwd(j) = logP(suffix from
    * j), posterior of piece (i, j) = exp(fwd(i) + logp + bwd(j) − total).
    * Returns (expected counts, word log-likelihood); (empty, −∞) when the
    * model cannot segment the word. */
  def expectedCounts(w: String, model: Map[String, Double],
                     maxLen: Int = MaxPieceLen): (Map[String, Double], Double) = {
    val n = w.length
    val fwd = Array.fill(n + 1)(Double.NegativeInfinity); fwd(0) = 0.0
    for (j <- 1 to n; i <- math.max(0, j - maxLen) until j)
      model.get(w.substring(i, j)).foreach(lp =>
        fwd(j) = logSumExp(fwd(j), fwd(i) + lp))
    val total = fwd(n)
    if (total == Double.NegativeInfinity) return (Map.empty, total)
    val bwd = Array.fill(n + 1)(Double.NegativeInfinity); bwd(n) = 0.0
    for (i <- (n - 1) to 0 by -1; j <- (i + 1) to math.min(n, i + maxLen))
      model.get(w.substring(i, j)).foreach(lp =>
        bwd(i) = logSumExp(bwd(i), lp + bwd(j)))
    val acc = scala.collection.mutable.Map.empty[String, Double]
    for (i <- 0 until n; j <- (i + 1) to math.min(n, i + maxLen))
      model.get(w.substring(i, j)).foreach { lp =>
        val post = math.exp(fwd(i) + lp + bwd(j) - total)
        val piece = w.substring(i, j)
        acc(piece) = acc.getOrElse(piece, 0.0) + post
      }
    (acc.toMap, total)
  }

  /** One distributed EM round over the word-type table `wt(w, n)`:
    * broadcast the model, emit frequency-weighted expected counts per
    * word type (map-only), sum with ONE combinable groupBy, renormalize.
    * Returns (new model, total corpus log-likelihood). */
  def emRound(wt: DataFrame, model: Map[String, Double],
              maxLen: Int = MaxPieceLen): (Map[String, Double], Double) = {
    val spark = wt.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    val contrib = wt.select(col("w"), col("n")).as[(String, Long)]
      .flatMap { case (w, n) =>
        val (cnt, ll) = expectedCounts(w, bc.value, maxLen)
        cnt.iterator.map { case (p, c) => (p, n * c, 0.0) } ++
          Iterator.single(("", 0.0, if (ll == Double.NegativeInfinity) 0.0 else n * ll))
      }.toDF("piece", "c", "ll")
    val rows = contrib.groupBy(col("piece"))
      .agg(sum(col("c")).as("c"), sum(col("ll")).as("ll"))
      .collect()
    val ll = rows.map(_.getDouble(2)).sum
    val counts = rows.filter(_.getString(0).nonEmpty)
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val total = counts.values.sum
    val next = counts.collect { case (p, c) if c > 0 => p -> math.log(c / total) }
    (next, ll)
  }

  /** Viterbi (max-probability) segmentation; ties prefer the LONGER
    * final piece — deterministic run-to-run. Empty result when the model
    * cannot segment the word. */
  def viterbiSegment(w: String, model: Map[String, Double],
                     maxLen: Int = MaxPieceLen): Seq[String] = {
    val n = w.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity); best(0) = 0.0
    val back = Array.fill(n + 1)(-1)
    for (j <- 1 to n; i <- math.max(0, j - maxLen) until j)
      model.get(w.substring(i, j)).foreach { lp =>
        val cand = best(i) + lp
        // strict > with i ascending: on an exact tie the earlier (smaller)
        // i — the longer final piece — is kept
        if (cand > best(j)) { best(j) = cand; back(j) = i }
      }
    if (best(n) == Double.NegativeInfinity) return Nil
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var j = n
    while (j > 0) { val i = back(j); w.substring(i, j) +=: out; j = i }
    out.toList
  }

  /** Distributed piece-usage census: Viterbi-encode every word type
    * under the broadcast model, sum piece usage weighted by word
    * frequency — the "what would this vocabulary do to the corpus"
    * report (fertility, coverage) as one map + one combinable groupBy. */
  def encodeCensus(docs: DataFrame, model: Map[String, Double],
                   maxLen: Int = MaxPieceLen): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(model)
    Bpe.wordTypes(docs).select(col("w"), col("n")).as[(String, Long)]
      .flatMap { case (w, n) =>
        viterbiSegment(w, bc.value, maxLen).iterator.map(p => (p, n))
      }.toDF("piece", "n")
      .groupBy(col("piece")).agg(sum(col("n")).as("n"))
  }

  /** Train: seed → `rounds` × (EM + prune toward `pruneTo`). Pruning
    * drops the lowest-probability multi-char pieces (ties: score asc,
    * piece desc), never single characters, at most 20% of the multi-char
    * set per round (the paper's schedule). Returns the final model. */
  def train(docs: DataFrame, seedSize: Int, rounds: Int, pruneTo: Int,
            maxLen: Int = MaxPieceLen): Map[String, Double] = {
    val wt = Bpe.wordTypes(docs).localCheckpoint()
    try {
      // the seed reads the SAME checkpointed type table as the EM rounds
      // — the corpus is tokenized exactly once per train() call
      var model = seedVocabOfTypes(wt, seedSize, maxLen)
      // NOTE: EM is monotone in likelihood only BETWEEN prunes (pruning
      // removes probability mass by design) — UnigramSpec asserts the
      // prune-free monotone case; no cross-prune invariant is claimed.
      for (_ <- 0 until rounds) {
        val (next, _) = emRound(wt, model, maxLen)
        val (singles, multi) = next.partition(_._1.length == 1)
        val excess = multi.size - math.max(0, pruneTo - singles.size)
        val toDrop = math.min(excess, math.max(0, (multi.size * 0.2).toInt))
        model =
          if (toDrop <= 0) next
          else {
            val kept = multi.toSeq
              .sortBy { case (p, s) => (-s, p) } // best first; ties piece asc
              .dropRight(toDrop).toMap ++ singles
            // renormalize over the kept mass
            val z = kept.values.map(math.exp).sum
            kept.map { case (p, s) => p -> (s - math.log(z)) }
          }
      }
      model
    } finally { wt.unpersist(); () }
  }
}
