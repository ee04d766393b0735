package graft.analysis

import java.text.Normalizer
import scala.collection.mutable.ArrayBuffer

/** The ICU analysis module's remaining pieces (reference:
  * /root/reference/src/Lucene.Net.Analysis.ICU/Analysis/ICU/ —
  * Segmentation/ICUTokenizer.cs + ScriptIterator.cs,
  * ICUNormalizer2Filter.cs; ICUFoldingFilter and the collation pieces
  * live in [[Folding]]/[[Collation]]):
  *
  *  - ICUTokenizer (Segmentation/ICUTokenizer.cs:36-60 +
  *    ScriptIterator.cs:100-160): text is first split into SCRIPT RUNS —
  *    a run's script is the first non-Common/Inherited script seen, and
  *    Common/Inherited characters always continue the current run — and
  *    each run is word-segmented independently (per-script break
  *    customization is the ICUTokenizerConfig extension point; the
  *    default is UAX#29, which [[UAX29Tokenizer]] implements by hand), every
  *    token carrying a ScriptAttribute
  *    (TokenAttributes/ScriptAttribute.cs).
  *  - ICUNormalizer2Filter (ICUNormalizer2Filter.cs:30-41, default
  *    normalizer nfkc_cf): NFKC compatibility normalization + Unicode
  *    case folding + canonical recomposition. The JDK ships NFKC but not
  *    the case-fold table, so the fold here is per-codepoint lowercase
  *    plus the full-fold expansions lowercase alone misses (ß/ẞ→ss,
  *    ŉ→ʼn, ﬀ-ﬆ and other compat ligatures are already split by NFKC) —
  *    the deviations from ICU's full table are Cherokee (ICU folds
  *    UPPER→lower for it) and a handful of Armenian/Greek presentation
  *    forms, all NFKC-decomposed first here, so common-script behavior
  *    matches.
  */
object Icu {

  // ------------------------------------------------------------------
  // ICUTokenizer analog: script-run segmentation + per-run UAX#29
  // ------------------------------------------------------------------

  import Character.UnicodeScript

  private def scriptOf(cp: Int): UnicodeScript =
    try UnicodeScript.of(cp) catch { case _: Exception => UnicodeScript.UNKNOWN }
  private def isCommonish(sc: UnicodeScript): Boolean =
    sc == UnicodeScript.COMMON || sc == UnicodeScript.INHERITED

  /** Script runs: (start, end, script). Common/Inherited continue the
    * current run and a run adopts the first concrete script it meets
    * (ScriptIterator.cs:112-126); a run ends when a DIFFERENT concrete
    * script follows. A text of only Common chars is one COMMON run. */
  def scriptRuns(s: String): Seq[(Int, Int, UnicodeScript)] = {
    val out = ArrayBuffer.empty[(Int, Int, UnicodeScript)]
    var start = 0
    var runScript: UnicodeScript = UnicodeScript.COMMON
    var adopted = false
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val sc = scriptOf(cp)
      if (isCommonish(sc) || !adopted || sc == runScript) {
        if (!isCommonish(sc) && !adopted) { runScript = sc; adopted = true }
      } else {
        out += ((start, i, runScript))
        start = i; runScript = sc; adopted = true
      }
      i += Character.charCount(cp)
    }
    if (start < s.length || out.isEmpty) out += ((start, s.length, runScript))
    out.toSeq
  }

  /** A word token + the script of its run (the ScriptAttribute). */
  final case class ScriptToken(term: String, script: String, startOff: Int,
                               endOff: Int, tpe: String)

  /** Script-run split, then the hand-written UAX#29 engine per run
    * (DefaultICUTokenizerConfig's default word breaker), offsets
    * rebased to the whole input. */
  def tokenize(s: String): Array[ScriptToken] =
    scriptRuns(s).iterator.flatMap { case (a, b, sc) =>
      val name = sc.name
      UAX29Tokenizer.tokenize(s.substring(a, b)).iterator.map(t =>
        ScriptToken(t.term, name, t.startOff + a, t.endOff + a, t.tpe))
    }.toArray

  // ------------------------------------------------------------------
  // ICUNormalizer2Filter analog (nfkc / nfkc_cf)
  // ------------------------------------------------------------------

  def nfkc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFKC)

  // full-fold expansions per-codepoint lowercase misses (the 1:N rows
  // that survive NFKC): sharp s and the apostrophe-n ligature
  private val foldExpansions: Map[Int, String] =
    Map(0x00DF -> "ss", 0x1E9E -> "ss", 0x0149 -> "ʼn")

  private def caseFold(s: String): String = {
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      foldExpansions.get(cp) match {
        case Some(rep) => sb.append(rep)
        case None => sb.appendAll(Character.toChars(Character.toLowerCase(cp)))
      }
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** nfkc_cf: NFKC, case fold, then NFC recomposition (ICU applies the
    * fold inside one closure pass; decompose-fold-recompose is the
    * equivalent pipeline formulation). */
  def nfkcCaseFold(s: String): String =
    Normalizer.normalize(caseFold(nfkc(s)), Normalizer.Form.NFC)
}
