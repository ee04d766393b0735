package graft.bm25

import graft.util.SmallFloat

/** BM25 scoring math, reproducing the reference's exact float cast points so
  * scores are rank- and bit-identical (reference:
  * /root/reference/src/Lucene.Net/Search/Similarities/BM25Similarity.cs:62-290).
  *
  * All intermediates that the reference computes in float stay Float here;
  * the idf log and avgdl division happen in double then cast, exactly as the
  * reference does.
  */
object BM25 extends Serializable {
  val K1: Float = 1.2f
  val B: Float = 0.75f

  /** 256-entry decode table: NORM_TABLE[b] = 1/f^2, f = byte315ToFloat(b)
    * (BM25Similarity.cs:152-161). Index 0 maps to +Infinity (norm absent
    * handled separately by the caller, as the reference does with
    * norms==null → b acts as 0). */
  val NormTable: Array[Float] = {
    val t = new Array[Float](256)
    var i = 0
    while (i < 256) {
      val f = SmallFloat.byte315ToFloat(i.toByte)
      t(i) = 1.0f / (f * f)
      i += 1
    }
    t
  }

  /** Norm encode at index time: byte315(boost/sqrt(fieldLength)), boost=1
    * (BM25Similarity.cs:107-116; ComputeNorm at :163-167 uses
    * length - numOverlap). */
  def encodeNorm(bm25DocLen: Int): Byte =
    SmallFloat.floatToByte315(1.0f / math.sqrt(bm25DocLen.toDouble).toFloat)

  /** idf = (float) log(1 + (maxDoc - df + 0.5)/(df + 0.5)) — double math,
    * float cast, maxDoc NOT numDocs (BM25Similarity.cs:70-73,190-196). */
  def idf(docFreq: Long, maxDoc: Long): Float =
    math.log(1 + (maxDoc - docFreq + 0.5d) / (docFreq + 0.5d)).toFloat

  /** avgdl = (float)(sumTotalTermFreq / (double) maxDoc)
    * (BM25Similarity.cs:94-105); 1f when the stat is absent. */
  def avgFieldLength(sumTotalTermFreq: Long, maxDoc: Long): Float =
    if (sumTotalTermFreq <= 0) 1f
    else (sumTotalTermFreq / maxDoc.toDouble).toFloat

  /** Norm byte marking a field with norms OMITTED (the reference's
    * StringField sets OmitNorms = true — Document/StringField.cs): byte 0
    * is unreachable from [[encodeNorm]] (1/sqrt(dl) can't underflow to 0
    * for any real doc length), so it is free to carry the sentinel. */
  val OmitNormsByte: Int = 0

  /** Freq-independent per-norm-byte cache:
    * cache[b] = k1 * ((1-b) + b * NORM_TABLE[b] / avgdl)
    * (BM25Similarity.cs:227-240). Entry 0 implements the norms-omitted
    * score — the reference with norms==null uses k1 in place of the cache
    * entry (score = weight*tf/(tf+k1), BM25Similarity.cs:271-272), i.e.
    * no length normalization at all. */
  def normCache(avgdl: Float): Array[Float] = {
    val cache = new Array[Float](256)
    var i = 0
    while (i < 256) {
      cache(i) = K1 * ((1 - B) + B * NormTable(i) / avgdl)
      i += 1
    }
    cache(OmitNormsByte) = K1
    cache
  }

  /** Doc length decoded from the norm byte for the SimilarityBase family
    * (LM/DFR/IB): the omit-norms sentinel decodes to 1 — the reference
    * supplies docLen = 1F when norms are omitted
    * (SimilarityBase.cs BasicSimScorer.Score). */
  def docLen(normByte: Byte): Float =
    if ((normByte & 0xff) == OmitNormsByte) 1f else NormTable(normByte & 0xff)

  /** Per-hit score: weightValue * tf / (tf + cache[normByte]) with
    * weightValue = boost * idf * (k1+1) (BM25Similarity.cs:264-274).
    * If the doc has no norm, the reference uses k1 in place of the cache
    * entry (b acts as 0, :271-272). */
  def score(tf: Float, normByte: Byte, weightValue: Float, cache: Array[Float]): Float =
    weightValue * tf / (tf + cache(normByte & 0xff))

  def weightValue(idfSum: Float, boost: Float): Float =
    idfSum * boost * (K1 + 1)

  /** Upper bound of a single term's score contribution given per-block
    * (maxTf, minNormByte): BM25 is monotone in tf and anti-monotone in the
    * cache entry, so weightValue * maxTf / (maxTf + min cache) bounds every
    * hit in the block. This powers block-max WAND pruning (public
    * literature: Broder et al. WAND; Ding & Suel block-max indexes) —
    * NOT present in the reference (Lucene 4.8 predates it). */
  def blockMaxScore(maxTf: Int, minCacheEntry: Float, weightValue: Float): Float =
    weightValue * maxTf / (maxTf + minCacheEntry)
}
