package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** CJK bigram tokenization (reference: the CJKAnalyzer chain —
  * Lucene.Net.Analysis.Common/Analysis/Cjk/CJKAnalyzer.cs +
  * CJKBigramFilter.cs — re-thought as a tokenizer wrapper): the UAX#29
  * tokenizer emits one token per Han ideograph (type IDEOGRAPHIC); runs
  * of n >= 2 consecutive ideograph tokens become n-1 OVERLAPPING bigrams
  * (the standard CJK indexing unit — no dictionary segmentation needed),
  * a lone ideograph stays a unigram, and non-CJK tokens pass through
  * untouched, so mixed Latin/Han text analyzes each script its own way.
  * Like the reference filter, consecutiveness is judged on the TOKEN
  * stream, not character adjacency — ideographs separated by punctuation
  * still bigram (the reference's documented behavior). */
object CJKBigram {

  val DOUBLE = "<DOUBLE>"
  val SINGLE = "<SINGLE>"

  def tokenizer(base: String => Array[RawToken] = UAX29Tokenizer.tokenize)
      : String => Array[RawToken] =
    (text: String) => {
      val raw = base(text)
      val out = new ArrayBuffer[RawToken](raw.length)
      var i = 0
      while (i < raw.length) {
        if (raw(i).tpe == UAX29Tokenizer.IDEOGRAPHIC) {
          var j = i
          while (j + 1 < raw.length &&
                 raw(j + 1).tpe == UAX29Tokenizer.IDEOGRAPHIC) j += 1
          if (j == i) out += RawToken(raw(i).term, raw(i).startOff,
            raw(i).endOff, SINGLE)
          else {
            var k = i
            while (k < j) {
              out += RawToken(raw(k).term + raw(k + 1).term,
                raw(k).startOff, raw(k + 1).endOff, DOUBLE)
              k += 1
            }
          }
          i = j + 1
        } else {
          out += raw(i)
          i += 1
        }
      }
      out.toArray
    }

  /** Serializable function object so analyzer instances using it can ship
    * to executors. */
  object Tokenize extends (String => Array[RawToken]) with Serializable {
    private val f = tokenizer()
    def apply(text: String): Array[RawToken] = f(text)
  }
}
