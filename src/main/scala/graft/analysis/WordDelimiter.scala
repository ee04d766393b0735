package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Identifier sub-word splitting for source code (reference:
  * Analysis/Miscellaneous/WordDelimiterFilter.cs with its default
  * GENERATE_WORD_PARTS | GENERATE_NUMBER_PARTS | SPLIT_ON_CASE_CHANGE |
  * SPLIT_ON_NUMERICS flags — re-thought as a tokenizer wrapper): each
  * token splits into sub-words at
  *
  *   - delimiter characters (non letter/digit — `_`, `-`, `.` survive
  *     inside UAX#29 tokens and are dropped here),
  *   - lower→Upper case transitions (`camelCase` → camel, Case),
  *   - an UPPER-run followed by a capitalized word (`HTTPResponse` →
  *     HTTP, Response — the run's last upper starts the next word),
  *   - letter↔digit transitions (`foo2bar` → foo, 2, bar).
  *
  * Sub-words keep exact source offsets; each occupies its own position
  * (the analyzer chain numbers them like any token). `preserveOriginal`
  * additionally emits the unsplit token (at its own position — a
  * simplification vs the reference's posIncr-0 original, documented
  * here) so exact-identifier queries still hit. Case information is used
  * for splitting and then the chain's lowercase filter normalizes. */
object WordDelimiter {

  /** [start, end) sub-word slices of one token's text. */
  def subWords(s: String): Seq[(Int, Int)] = {
    val n = s.length
    def alnum(c: Char) = Character.isLetterOrDigit(c)
    def boundary(j: Int): Boolean = {
      val a = s(j - 1); val b = s(j)
      (Character.isDigit(a) != Character.isDigit(b)) ||
      (a.isLower && b.isUpper) ||
      (a.isUpper && b.isUpper && j + 1 < n && s(j + 1).isLower)
    }
    val parts = new ArrayBuffer[(Int, Int)]()
    var i = 0
    while (i < n) {
      if (!alnum(s(i))) i += 1
      else {
        var j = i + 1
        while (j < n && alnum(s(j)) && !boundary(j)) j += 1
        parts += ((i, j))
        i = j
      }
    }
    parts.toSeq
  }

  def tokenizer(base: String => Array[RawToken] = UAX29Tokenizer.tokenize,
                preserveOriginal: Boolean = false): String => Array[RawToken] =
    (text: String) => {
      val raw = base(text)
      val out = new ArrayBuffer[RawToken](raw.length * 2)
      raw.foreach { t =>
        val parts = subWords(t.term)
        val whole = parts.length == 1 &&
          parts.head._1 == 0 && parts.head._2 == t.term.length
        if (whole) out += t
        else {
          if (preserveOriginal) out += t
          parts.foreach { case (a, b) =>
            out += RawToken(t.term.substring(a, b),
              t.startOff + a, t.startOff + b, t.tpe)
          }
        }
      }
      out.toArray
    }

  /** Serializable default instance (splits, no original). */
  object Tokenize extends (String => Array[RawToken]) with Serializable {
    private val f = tokenizer()
    def apply(text: String): Array[RawToken] = f(text)
  }
}
