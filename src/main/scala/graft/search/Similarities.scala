package graft.search

import graft.bm25.{BM25, TfIdf}
import graft.build.TermDictRow

/** Pluggable per-query scoring contract (reference:
  * Search/Similarities/Similarity.cs — a Similarity turns collection +
  * term statistics into per-term weights, then per-(doc,term) scores,
  * plus the boolean combination factors coord and queryNorm).
  *
  * The BM25 fast path (WAND, Aggregator top-k) stays specialized in
  * [[Searcher]]; [[Searcher.searchWith]] is the generic path any
  * Similarity can ride (TermQ + flat BoolQ), scoring exactly like the
  * reference's CreateNormalizedWeight pipeline:
  *
  *   1. weights are created from ALL query terms (TF-IDF's queryNorm
  *      couples them: 1/sqrt(Σ (idf·boost)²));
  *   2. each matching (doc, term) scores independently;
  *   3. clause scores sum in clause order, times coord(matched, total).
  */
trait SimilarityLike extends Serializable {
  /** Per-term normalized weight values, created once per query. */
  def weights(terms: Seq[(String, Float)], stats: Map[String, TermDictRow],
              maxDoc: Long, sumTotalTermFreq: Long): Map[String, Float]
  def score(tf: Float, normByte: Byte, weightValue: Float): Float
  /** coord(matched, total) — 1 for BM25, matched/total for TF-IDF
    * (reference: Similarity.cs:122-143 vs TFIDFSimilarity.Coord). */
  def coord(matched: Int, total: Int): Float
}

/** Query-likelihood with Dirichlet smoothing (reference:
  * Search/Similarities/LMDirichletSimilarity.cs, default mu = 2000):
  *
  *   score = boost * max(0, log(1 + tf/(mu·p(t|C))) + log(mu/(dl + mu)))
  *
  * p(t|C) = totalTermFreq / sumTotalTermFreq (the collection language
  * model); dl comes from the same lossy norm byte the other similarities
  * read (the reference decodes norms identically across families). The
  * per-term weightValue carries mu·p(t|C) (boost folded by the caller's
  * clause sum; per-term boosts fold into the weight here as a divisor —
  * equivalent at boost=1, the reference query set's case). */
final class LMDirichletSimilarity(mu: Float = 2000f) extends SimilarityLike {
  private var sumTtf = 1L
  def weights(terms: Seq[(String, Float)], stats: Map[String, TermDictRow],
              maxDoc: Long, sumTotalTermFreq: Long): Map[String, Float] = {
    sumTtf = math.max(1L, sumTotalTermFreq)
    terms.collect { case (t, _) if stats.contains(t) =>
      // mu * p(t|C), double then float like the reference's LMStats
      t -> (mu * (stats(t).totalTf / sumTtf.toDouble)).toFloat
    }.toMap
  }
  def score(tf: Float, normByte: Byte, weightValue: Float): Float = {
    val dl = BM25.NormTable(normByte & 0xff) // 1/f^2 = decoded doc length
    val s = (math.log(1 + tf / weightValue) + math.log(mu / (dl + mu))).toFloat
    if (s > 0f) s else 0f
  }
  def coord(matched: Int, total: Int): Float = 1f
}

/** BM25 (k1=1.2, b=0.75): queryNorm = coord = 1. */
final class BM25Similarity(avgdl: Float) extends SimilarityLike {
  private val cache = BM25.normCache(avgdl)
  def weights(terms: Seq[(String, Float)], stats: Map[String, TermDictRow],
              maxDoc: Long, sumTotalTermFreq: Long): Map[String, Float] =
    terms.collect { case (t, boost) if stats.contains(t) =>
      t -> BM25.weightValue(BM25.idf(stats(t).df, maxDoc), boost)
    }.toMap
  def score(tf: Float, normByte: Byte, weightValue: Float): Float =
    BM25.score(tf, normByte, weightValue, cache)
  def coord(matched: Int, total: Int): Float = 1f
}

/** Classic TF-IDF (DefaultSimilarity): shared queryNorm across terms,
  * coord = matched/total. */
final class TfIdfSimilarity extends SimilarityLike {
  def weights(terms: Seq[(String, Float)], stats: Map[String, TermDictRow],
              maxDoc: Long, sumTotalTermFreq: Long): Map[String, Float] = {
    val live = terms.filter(t => stats.contains(t._1))
    if (live.isEmpty) return Map.empty
    // sumOfSquaredWeights over ALL clauses, float accumulation in clause
    // order (reference: BooleanWeight.GetValueForNormalization)
    var ssw = 0f
    val qw = live.map { case (t, boost) =>
      val w = TfIdf.idf(stats(t).df, maxDoc) * boost
      ssw += w * w
      (t, w)
    }
    val qn = TfIdf.queryNorm(ssw)
    qw.map { case (t, w) =>
      t -> w * qn * TfIdf.idf(stats(t).df, maxDoc)
    }.toMap
  }
  def score(tf: Float, normByte: Byte, weightValue: Float): Float =
    TfIdf.score(tf, normByte, weightValue)
  def coord(matched: Int, total: Int): Float = matched.toFloat / total
}
