package graft.bm25

import graft.util.SmallFloat

/** Classic TF-IDF ("DefaultSimilarity") scoring math with the reference's
  * exact float cast points (reference:
  * /root/reference/src/Lucene.Net/Search/Similarities/TFIDFSimilarity.cs +
  * DefaultSimilarity.cs):
  *
  *   tf        = (float) sqrt(freq)
  *   idf       = (float)(log(maxDoc / (double)(df + 1)) + 1.0)
  *   queryNorm = (float)(1.0 / sqrt(sumOfSquaredWeights))   [unlike BM25!]
  *   norm      = byte315 decode of byte315(1/sqrt(dl))      [same byte as BM25]
  *   score     = tf * weightValue * normDecode(b),
  *               weightValue = queryWeight * idf, queryWeight = idf * boost * queryNorm
  *
  * The index is similarity-agnostic: the stored norm byte and (df, maxDoc,
  * tf) stats feed either similarity — exactly the reference's pluggable
  * Similarity contract (Search/Similarities/Similarity.cs). */
object TfIdf extends Serializable {

  /** DecodeNormValue: NORM_TABLE[b] = byte315ToFloat(b)
    * (DefaultSimilarity.cs norm decode). */
  val NormTable: Array[Float] = Array.tabulate(256)(i => SmallFloat.byte315ToFloat(i.toByte))

  def idf(docFreq: Long, maxDoc: Long): Float =
    (math.log(maxDoc / (docFreq + 1).toDouble) + 1.0).toFloat

  def tf(freq: Float): Float = math.sqrt(freq).toFloat

  def queryNorm(sumOfSquaredWeights: Float): Float =
    (1.0 / math.sqrt(sumOfSquaredWeights)).toFloat

  /** Single-term weight pipeline (CreateNormalizedWeight):
    * queryWeight = idf*boost; ssw = queryWeight^2; after normalize:
    * value = queryWeight * queryNorm * idf. */
  def weightValue(idf: Float, boost: Float): Float = {
    val queryWeight = idf * boost
    val ssw = queryWeight * queryWeight
    val qn = queryNorm(ssw)
    queryWeight * qn * idf
  }

  def score(freq: Float, normByte: Byte, weightValue: Float): Float =
    // omit-norms sentinel (byte 0, unreachable from encodeNorm): the
    // reference with norms==null applies NO length normalization
    // (TFIDFSimilarity raw score; StringField sets OmitNorms)
    tf(freq) * weightValue *
      (if ((normByte & 0xff) == BM25.OmitNormsByte) 1f else NormTable(normByte & 0xff))
}
