package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Liang's hyphenation algorithm (the TeX82 pattern method; published in
  * F. M. Liang, "Word Hy-phen-a-tion by Com-put-er", 1983) over
  * user-supplied pattern tables — the engine behind the reference's
  * HyphenationCompoundWordTokenFilter (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Compound/
  * Hyphenation/HyphenationTree.cs). The reference packs patterns into a
  * ternary trie; the semantics are a pure function, restated here as a
  * longest-prefix scan — patterns are user data riding the task closure,
  * so hyphenation stays a map-only row transform at any corpus scale.
  *
  * A pattern like "hy3ph" is letters "hyph" with interletter values
  * [0,0,3,0,0]: values(k) sits in the gap BEFORE letter k. Matching
  * (HyphenationTree.cs SearchPatterns:302-370): every pattern that is a
  * prefix of the padded word at position i max-merges values(k) into
  * il(i+k). A break is legal after the first `remainCharCount` letters
  * and before the last `pushCharCount` (HyphenateCore:388-470): offset i
  * breaks iff il(i+1) is odd and remainCharCount <= i <= len - pushCharCount.
  * '.' in a pattern anchors at the padded word boundary, as in TeX. */
final class Hyphenator(patternStrs: Seq[String],
                       exceptions: Map[String, Seq[Int]] = Map.empty)
    extends Serializable {

  // parse "n1g" -> ("ng", [0,1,0]); digits set the value of the CURRENT gap
  private val byFirst: Map[Char, Array[(String, Array[Byte])]] = {
    val parsed = patternStrs.map { ps =>
      val letters = new java.lang.StringBuilder
      val vals = ArrayBuffer[Byte](0)
      ps.foreach { c =>
        if (c >= '0' && c <= '9') vals(vals.length - 1) = (c - '0').toByte
        else { letters.append(c); vals += 0 }
      }
      (letters.toString, vals.toArray)
    }
    parsed.toArray.groupBy(_._1.charAt(0))
  }

  /** Break offsets [0, p1, ..., pk, len] (k >= 1), or None when the word
    * has no legal hyphenation point — the reference returns null there
    * and the compound filter passes the token through unsplit. */
  def hyphenate(word: String, remainCharCount: Int = 1,
                pushCharCount: Int = 1): Option[Array[Int]] = {
    val len = word.length
    if (len < remainCharCount + pushCharCount) return None
    val lower = word.toLowerCase // the classmap's case normalization
    val pts: Seq[Int] = exceptions.get(lower) match {
      case Some(ex) => // stoplist path: strict upper bound, as in the reference
        ex.filter(j => j >= remainCharCount && j < len - pushCharCount)
      case None =>
        val padded = "." + lower + "."
        val il = new Array[Byte](len + 3)
        var i = 0
        while (i <= len) { searchPatterns(padded, i, il); i += 1 }
        (0 until len).filter(i =>
          (il(i + 1) & 1) == 1 && i >= remainCharCount &&
            i <= len - pushCharCount)
    }
    if (pts.isEmpty) None else Some((0 +: pts :+ len).toArray)
  }

  private def searchPatterns(padded: String, index: Int, il: Array[Byte]): Unit =
    byFirst.get(padded.charAt(index)) match {
      case Some(cands) =>
        var c = 0
        while (c < cands.length) {
          val (ls, vals) = cands(c)
          if (padded.startsWith(ls, index)) {
            var k = 0
            while (k < vals.length) {
              val j = index + k
              if (j < il.length && vals(k) > il(j)) il(j) = vals(k)
              k += 1
            }
          }
          c += 1
        }
      case None =>
    }
}

object Hyphenation {

  /** HyphenationCompoundWordTokenFilter decomposition (reference:
    * Analysis/Compound/HyphenationCompoundWordTokenFilter.cs:92-166 over
    * CompoundWordTokenFilterBase): every token >= `minWordSize` is
    * hyphenated (remain=push=1); subwords run between PAIRS of
    * hyphenation points (start point i, end point i+j), size-bounded by
    * [minSubwordSize, maxSubwordSize] with the too-long break-out; with a
    * dictionary only dictionary words survive — including the reference's
    * partLength-1 fallback (a subword whose last char is a linking
    * morpheme, the German "-s-"); `onlyLongestMatch` keeps the longest
    * hit per start point. Subwords are emitted AFTER the original token
    * at the same position with the ORIGINAL token's offsets (the >= 4.4
    * no-narrowing behavior, same as dictionaryCompound). */
  def hyphenationCompound(tokens: Array[Token], hyph: Hyphenator,
                          dictionary: Option[Set[String]] = None,
                          minWordSize: Int = 5, minSubwordSize: Int = 2,
                          maxSubwordSize: Int = 15,
                          onlyLongestMatch: Boolean = false): Array[Token] =
    tokens.flatMap { t =>
      val out = ArrayBuffer(t)
      if (t.term.length >= minWordSize) {
        hyph.hyphenate(t.term, 1, 1).foreach { hyp =>
          var i = 0
          while (i < hyp.length) {
            val start = hyp(i)
            val remaining = hyp.length - i
            var longest: String = null
            var j = 1
            var tooLong = false
            while (j < remaining && !tooLong) {
              val partLength = hyp(i + j) - start
              if (partLength > maxSubwordSize) tooLong = true
              else if (partLength >= minSubwordSize) {
                val sub = t.term.substring(start, start + partLength)
                dictionary match {
                  case None =>
                    if (onlyLongestMatch) {
                      if (longest == null || longest.length < sub.length)
                        longest = sub
                    } else out += t.copy(term = sub)
                  case Some(dict) if dict.contains(sub) =>
                    if (onlyLongestMatch) {
                      if (longest == null || longest.length < sub.length)
                        longest = sub
                    } else out += t.copy(term = sub)
                  case Some(dict)
                      if dict.contains(sub.substring(0, partLength - 1)) =>
                    val short = sub.substring(0, partLength - 1)
                    if (onlyLongestMatch) {
                      if (longest == null || longest.length < short.length)
                        longest = short
                    } else out += t.copy(term = short)
                  case _ =>
                }
              }
              j += 1
            }
            if (onlyLongestMatch && longest != null)
              out += t.copy(term = longest)
            i += 1
          }
        }
      }
      out.toArray[Token]
    }
}
