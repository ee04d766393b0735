package graft.analysis

/** Diacritic/compatibility folding (reference:
  * Lucene.Net.Analysis.ICU/Analysis/Icu/ICUFoldingFilter.cs and
  * Analysis.Common/Analysis/Miscellaneous/ASCIIFoldingFilter.cs —
  * re-expressed on the JDK: NFKD compatibility decomposition, combining
  * marks stripped, plus the non-decomposable Latin special cases the
  * ASCII folder maps by table). "café" → "cafe", "straße" → "strasse",
  * "ﬁle" (ligature) → "file".
  *
  * Folding runs AFTER per-codepoint lowercasing in the analyzer chain
  * (the reference filter order), so only lowercase special cases are
  * listed; NFKD handles every decomposable accent generically. */
object Folding extends Serializable {

  /** Lowercase Latin codepoints with no NFKD decomposition that the
    * reference ASCII folder still maps (ASCIIFoldingFilter.cs foldToASCII
    * table, lowercase rows). */
  private val Special: Map[Char, String] = Map(
    'ß' -> "ss", 'æ' -> "ae", 'œ' -> "oe", 'ø' -> "o", 'đ' -> "d",
    'ð' -> "d", 'þ' -> "th", 'ħ' -> "h", 'ı' -> "i", 'ĸ' -> "k",
    'ł' -> "l", 'ŋ' -> "n", 'ſ' -> "s", 'ŧ' -> "t")

  /** Fold one already-lowercased term. Idempotent; identity on ASCII. */
  def fold(s: String): String = {
    // fast path: pure ASCII never changes — skip the Normalizer call
    var ascii = true
    var i = 0
    while (ascii && i < s.length) { if (s.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (ascii) return s
    val pre = new java.lang.StringBuilder(s.length + 4)
    i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      Special.get(c) match {
        case Some(rep) => pre.append(rep)
        case None => pre.append(c)
      }
      i += 1
    }
    val nfkd = java.text.Normalizer.normalize(pre, java.text.Normalizer.Form.NFKD)
    val out = new java.lang.StringBuilder(nfkd.length)
    i = 0
    while (i < nfkd.length) {
      val c = nfkd.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) out.append(c)
      i += 1
    }
    out.toString
  }
}
