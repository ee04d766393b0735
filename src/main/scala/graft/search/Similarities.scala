package graft.search

import graft.bm25.{BM25, TfIdf}
import graft.build.TermDictRow

/** Pluggable per-query scoring contract (reference:
  * Search/Similarities/Similarity.cs — a Similarity turns collection +
  * term statistics into per-clause weights, then per-(doc,clause) scores,
  * plus the boolean combination factors coord and queryNorm).
  *
  * The BM25 fast path (WAND, Aggregator top-k) stays specialized in
  * [[Searcher]]; [[Searcher.searchWith]] is the generic path any
  * Similarity can ride (term, phrase, and flat boolean queries), scoring
  * exactly like the reference's CreateNormalizedWeight pipeline:
  *
  *   1. weights are created from ALL query clauses jointly (TF-IDF's
  *      queryNorm couples them: 1/sqrt(Σ (idfSum·boost)²)); unindexed
  *      terms still participate with df=0, like the reference's
  *      TermWeight over empty TermStatistics;
  *   2. each matching (doc, clause) scores independently — a clause is
  *      one term (TermQ) or a term sequence (PhraseQ, scored on its
  *      phrase freq);
  *   3. clause scores sum in clause order, times coord(matched, total).
  *
  * A clause weight is an opaque `Array[Float]` whose layout each
  * similarity defines for itself (a single normalized value for
  * BM25/TF-IDF; boost + per-term parameters for the SimilarityBase
  * families, whose phrase scoring is the reference's MultiSimScorer sum
  * of per-term scores at the shared phrase freq).
  */
trait SimilarityLike extends Serializable {
  /** One weight vector per clause, aligned index-for-index with
    * `clauses` — duplicate clauses each get their own weight, exactly
    * like the reference's independent per-BooleanClause Weights. */
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]]
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float
  /** coord(matched, total) — 1 for BM25, matched/total for TF-IDF
    * (reference: Similarity.cs:122-143 vs TFIDFSimilarity.Coord). */
  def coord(matched: Int, total: Int): Float

  protected final def dfOf(stats: Map[String, TermDictRow], t: String): Long =
    stats.get(t).map(_.df).getOrElse(0L)
  protected final def ttfOf(stats: Map[String, TermDictRow], t: String): Long =
    stats.get(t).map(_.totalTf).getOrElse(0L)
}

/** BM25 (k1=1.2, b=0.75): queryNorm = coord = 1; a phrase clause's
  * weight is weightValue(Σ idf) (BM25Similarity.cs:210-225), and the
  * score is linear in the weight so the sum matches the specialized
  * phrase path bit-for-bit. Layout: w = [weightValue]. */
final class BM25Similarity(avgdl: Float) extends SimilarityLike {
  private val cache = BM25.normCache(avgdl)
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      Array(BM25.weightValue(ts.map(t => BM25.idf(dfOf(stats, t), maxDoc)).sum, boost))
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float =
    BM25.score(tf, normByte, w(0), cache)
  def coord(matched: Int, total: Int): Float = 1f
}

/** Classic TF-IDF (DefaultSimilarity): shared queryNorm across clauses,
  * coord = matched/total; a phrase clause's idf is the float sum over its
  * terms (TFIDFSimilarity.IdfExplain over TermStatistics[]). Layout:
  * w = [normalized weight value]. */
final class TfIdfSimilarity extends SimilarityLike {
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] = {
    // sumOfSquaredWeights over ALL clauses in clause order (reference:
    // BooleanWeight.GetValueForNormalization) — unindexed terms included,
    // their TermWeight still carries idf(df=0) into queryNorm
    var ssw = 0f
    val qw = clauses.map { case (ts, boost) =>
      var idfSum = 0f
      ts.foreach(t => idfSum += TfIdf.idf(dfOf(stats, t), maxDoc))
      val w = idfSum * boost
      ssw += w * w
      (idfSum, w)
    }
    val qn = TfIdf.queryNorm(ssw)
    qw.map { case (idfSum, w) => Array(w * qn * idfSum) }
  }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float =
    TfIdf.score(tf, normByte, w(0))
  def coord(matched: Int, total: Int): Float = matched.toFloat / total
}

/** Query-likelihood with Dirichlet smoothing (reference:
  * Search/Similarities/LMDirichletSimilarity.cs, default mu = 2000):
  *
  *   score = Σ_terms max(0, boost·(log(1 + tf/(mu·p(t|C))) + log(mu/(dl + mu))))
  *
  * p(t|C) = (totalTermFreq+1)/(sumTotalTermFreq+1), the reference's
  * DefaultCollectionModel (LMSimilarity.cs:174-177 — add-one smoothed,
  * float division); dl decodes from the shared lossy norm byte. Multi-term
  * clauses sum per-term scores at the shared freq (MultiSimScorer).
  * Layout: w = [boost, mu·p(t1|C), mu·p(t2|C), …]. */
final class LMDirichletSimilarity(mu: Float = 2000f) extends SimilarityLike {
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      (boost +: ts.map(t =>
        mu * ((ttfOf(stats, t) + 1f) / (sumTotalTermFreq + 1f)))).toArray
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    val dl = BM25.docLen(normByte)
    val boost = w(0)
    var sum = 0f
    var i = 1
    while (i < w.length) {
      val s = boost *
        (math.log(1 + tf / w(i)) + math.log(mu / (dl + mu))).toFloat
      if (s > 0f) sum += s
      i += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = 1f
}

/** Query-likelihood with Jelinek-Mercer smoothing (reference:
  * Search/Similarities/LMJelinekMercerSimilarity.cs:60-63, default
  * lambda = 0.1 per the reference test matrix):
  *
  *   score = Σ_terms boost·log(1 + ((1-λ)·tf/dl) / (λ·p(t|C)))
  *
  * Layout: w = [boost, p(t1|C), p(t2|C), …]. */
final class LMJelinekMercerSimilarity(lambda: Float = 0.1f) extends SimilarityLike {
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      (boost +: ts.map(t =>
        (ttfOf(stats, t) + 1f) / (sumTotalTermFreq + 1f))).toArray
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    val dl = BM25.docLen(normByte)
    val boost = w(0)
    var sum = 0f
    var i = 1
    while (i < w.length) {
      sum += boost *
        math.log(1 + ((1 - lambda) * tf / dl) / (lambda * w(i))).toFloat
      i += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = 1f
}

/** Information-based LL/D(f)/H2 model (reference: IBSimilarity.cs:117-120
  * with DistributionLL.cs:40-43 — score = -log(λ/(tfn+λ)) —
  * LambdaDF.cs:38-41 — λ = (df+1)/(N+1) — and the same H2 normalization
  * DFR uses, c = 1):
  *
  *   tfn   = tf · log2(1 + avgdl/dl)
  *   score = Σ_terms boost · (-log(λ / (tfn + λ)))
  *
  * Layout: w = [boost, λ(t1), λ(t2), …]. */
final class IBLLSimilarity(avgdl: Float, c: Float = 1f,
                           useTtfLambda: Boolean = false) extends SimilarityLike {
  private def log2(x: Double): Double = math.log(x) / math.log(2)
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      // LambdaDF (df-based) or LambdaTTF (reference: LambdaTTF.cs —
      // λ = (ttf+1)/(N+1))
      (boost +: ts.map(t =>
        ((if (useTtfLambda) ttfOf(stats, t) else dfOf(stats, t)) + 1f) /
          (maxDoc + 1f))).toArray
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    val dl = BM25.docLen(normByte)
    val tfn = (tf * log2(1 + c * avgdl / dl)).toFloat
    val boost = w(0)
    var sum = 0f
    var i = 1
    while (i < w.length) {
      sum += boost * (-math.log(w(i) / (tfn + w(i)))).toFloat
      i += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = 1f
}

/** Information-based SPL/D(f)/H2 model (reference: IBSimilarity.cs:117-120
  * with DistributionSPL.cs:38-42 —
  * score = -log((λ^(tfn/(tfn+1)) - λ)/(1 - λ)) — LambdaDF.cs:38-41 —
  * λ = (df+1)/(N+1) — and the H2 normalization, c = 1):
  *
  *   tfn   = tf · log2(1 + avgdl/dl)
  *   score = Σ_terms boost · (-log((λ^(tfn/(tfn+1)) - λ)/(1 - λ)))
  *
  * Layout: w = [boost, λ(t1), λ(t2), …]. */
final class IBSPLSimilarity(avgdl: Float, c: Float = 1f,
                            useTtfLambda: Boolean = false) extends SimilarityLike {
  private def log2(x: Double): Double = math.log(x) / math.log(2)
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      (boost +: ts.map(t =>
        ((if (useTtfLambda) ttfOf(stats, t) else dfOf(stats, t)) + 1f) /
          (maxDoc + 1f))).toArray
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    val dl = BM25.docLen(normByte)
    val tfn = (tf * log2(1 + c * avgdl / dl)).toFloat
    val boost = w(0)
    var sum = 0f
    var i = 1
    while (i < w.length) {
      val lambda = w(i)
      sum += boost * (-math.log(
        (math.pow(lambda, tfn / (tfn + 1)) - lambda) / (1 - lambda))).toFloat
      i += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = 1f
}

/** Divergence-from-randomness I(F)L2 (reference: DFRSimilarity.cs:125-129
  * with BasicModelIF.cs:38-43 — tfn·log2(1 + (N+1)/(F+0.5)), F = total
  * term freq — AfterEffectL + NormalizationH2, c = 1):
  *
  *   tfn   = tf · log2(1 + avgdl/dl)
  *   score = Σ_terms boost · tfn·log2(1 + (N+1)/(F+0.5)) · 1/(tfn+1)
  *
  * Layout: w = [boost, if(t1), if(t2), …]. */
final class DFRIFL2Similarity(avgdl: Float, c: Float = 1f) extends SimilarityLike {
  private def log2(x: Double): Double = math.log(x) / math.log(2)
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      (boost +: ts.map(t =>
        log2(1 + (maxDoc + 1.0) / (ttfOf(stats, t) + 0.5)).toFloat)).toArray
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    val dl = BM25.docLen(normByte)
    val tfn = (tf * log2(1 + c * avgdl / dl)).toFloat
    val boost = w(0)
    var sum = 0f
    var i = 1
    while (i < w.length) {
      sum += boost * (tfn * w(i)) * (1f / (tfn + 1f))
      i += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = 1f
}

/** Divergence-from-randomness G·L·H2 (reference: BasicModelG.cs:38-47 —
  * λ = (F+1)/(N + F+1), score = log2(λ+1) + tfn·log2((1+λ)/λ) — with
  * AfterEffectL and NormalizationH2, c = 1). Layout: w = [boost, λ…]. */
final class DFRGL2Similarity(avgdl: Float, c: Float = 1f) extends SimilarityLike {
  private def log2(x: Double): Double = math.log(x) / math.log(2)
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      (boost +: ts.map { t =>
        val f = ttfOf(stats, t) + 1.0
        (f / (maxDoc + f)).toFloat
      }).toArray
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    val dl = BM25.docLen(normByte)
    val tfn = (tf * log2(1 + c * avgdl / dl)).toFloat
    val boost = w(0)
    var sum = 0f
    var i = 1
    while (i < w.length) {
      val lambda = w(i)
      sum += boost *
        ((log2(lambda + 1) + tfn * log2((1 + lambda) / lambda)) *
          (1.0 / (1 + tfn))).toFloat
      i += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = 1f
}

/** Divergence-from-randomness I(n)·L·H1 (reference: NormalizationH1.cs —
  * tfn = tf·avgdl/dl, the linear normalization — with BasicModelIn +
  * AfterEffectL). Layout: w = [boost, in(t)…]. */
final class DFRInH1Similarity(avgdl: Float) extends SimilarityLike {
  private def log2(x: Double): Double = math.log(x) / math.log(2)
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      (boost +: ts.map(t =>
        log2((maxDoc + 1) / (dfOf(stats, t) + 0.5)).toFloat)).toArray
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    val dl = BM25.docLen(normByte)
    val tfn = tf * avgdl / dl
    val boost = w(0)
    var sum = 0f
    var i = 1
    while (i < w.length) {
      sum += boost * (tfn * w(i)) * (1f / (tfn + 1f))
      i += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = 1f
}

/** Average-of-similarities wrapper (reference: MultiSimilarity.cs —
  * per-hit score is the SUM over the sub-scorers, MultiSimilarity.cs
  * MultiSimScorer.Score). Weight layout concatenates each sub-sim's
  * clause weight behind its length: w = [len1, w1…, len2, w2…]. */
final class MultiSimilarity(sims: Seq[SimilarityLike]) extends SimilarityLike {
  require(sims.nonEmpty, "no sub-similarities")
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] = {
    val per = sims.map(_.clauseWeights(clauses, stats, maxDoc, sumTotalTermFreq))
    clauses.indices.map { ci =>
      per.flatMap(ws => ws(ci).length.toFloat +: ws(ci).toSeq).toArray
    }
  }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    var sum = 0f
    var i = 0
    var s = 0
    while (s < sims.length) {
      val len = w(i).toInt
      sum += sims(s).score(tf, normByte,
        java.util.Arrays.copyOfRange(w, i + 1, i + 1 + len))
      i += 1 + len
      s += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = sims.head.coord(matched, total)
}

/** Per-field similarity routing (reference:
  * Search/Similarities/PerFieldSimilarityWrapper.cs): each clause scores
  * under the similarity of ITS field — keyword clauses carry their field
  * as the `"field:value"` term prefix, content clauses have none. Clause
  * weights delegate clause-by-clause (each inner similarity sees a
  * singleton clause list, so cross-clause couplings like TF-IDF's
  * queryNorm stay within a field — the wrapper contract: coord/queryNorm
  * come from the wrapper, per-clause scoring from the field similarity).
  * Weight layout: w = [simIndex, …inner weight…]. */
final class PerFieldSimilarity(default: SimilarityLike,
    byField: Map[String, SimilarityLike]) extends SimilarityLike {
  private val sims: IndexedSeq[SimilarityLike] =
    (default +: byField.values.toSeq).distinct.toIndexedSeq

  private def fieldOf(terms: Seq[String]): String = {
    val t = terms.head
    val i = t.indexOf(':')
    if (i > 0) t.substring(0, i) else ""
  }

  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { c =>
      val sim = byField.getOrElse(fieldOf(c._1), default)
      val inner = sim.clauseWeights(Seq(c), stats, maxDoc, sumTotalTermFreq).head
      sims.indexOf(sim).toFloat +: inner
    }

  def score(tf: Float, normByte: Byte, w: Array[Float]): Float =
    sims(w(0).toInt).score(tf, normByte,
      java.util.Arrays.copyOfRange(w, 1, w.length))

  def coord(matched: Int, total: Int): Float = default.coord(matched, total)
}

/** Divergence-from-randomness I(n)L2 (reference: DFRSimilarity.cs:125-129
  * with BasicModelIn.cs:38-43, AfterEffectL.cs:38-41,
  * NormalizationH2.cs:56-59, c = 1):
  *
  *   tfn   = tf · log2(1 + avgdl/dl)
  *   score = Σ_terms boost · tfn·log2((N+1)/(df+0.5)) · 1/(tfn+1)
  *
  * The per-term log2((N+1)/(df+0.5)) factor precomputes into the weight
  * (double math, cast to float like the reference).
  * Layout: w = [boost, in(t1), in(t2), …]. */
final class DFRInL2Similarity(avgdl: Float, c: Float = 1f) extends SimilarityLike {
  private def log2(x: Double): Double = math.log(x) / math.log(2)
  def clauseWeights(clauses: Seq[(Seq[String], Float)],
                    stats: Map[String, TermDictRow],
                    maxDoc: Long, sumTotalTermFreq: Long): Seq[Array[Float]] =
    clauses.map { case (ts, boost) =>
      (boost +: ts.map(t =>
        log2((maxDoc + 1) / (dfOf(stats, t) + 0.5)).toFloat)).toArray
    }
  def score(tf: Float, normByte: Byte, w: Array[Float]): Float = {
    val dl = BM25.docLen(normByte)
    val tfn = (tf * log2(1 + c * avgdl / dl)).toFloat
    val boost = w(0)
    var sum = 0f
    var i = 1
    while (i < w.length) {
      sum += boost * (tfn * w(i)) * (1f / (tfn + 1f))
      i += 1
    }
    sum
  }
  def coord(matched: Int, total: Int): Float = 1f
}
