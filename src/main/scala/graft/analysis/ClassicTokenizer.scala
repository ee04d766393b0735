package graft.analysis

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** ClassicTokenizer + ClassicFilter + the ClassicAnalyzer chain — the
  * pre-3.1 StandardAnalyzer grammar (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Standard/
  * ClassicTokenizer.cs:34-76, ClassicFilter.cs:30-77,
  * ClassicAnalyzer.cs:30-120; the grammar is the published
  * ClassicTokenizerImpl.jflex production set, restated here as one
  * maximal-munch regex engine instead of a generated DFA).
  *
  * Productions, in rule-priority order (ties in match length go to the
  * EARLIER rule, longest match always wins — JFlex semantics):
  *   ALPHANUM    (letter|digit)+                        — letters exclude CJ
  *   APOSTROPHE  alpha ("'" alpha)+                     — O'Reilly, don't
  *   ACRONYM     letter "." (letter ".")+               — U.S.A.
  *   COMPANY     alpha ("&"|"@") alpha                  — AT&T, Excite@Home
  *   EMAIL       an (("."|"-"|"_") an)* "@" an (("."|"-") an)+
  *   HOST        an ("." an)+                           — www.nutch.org, 62.46
  *   NUM         digit-bearing runs joined by [_-/.,]   — 1-2-3, a1-b-c3
  *   CJ          one CJK/kana char per token
  *   ACRONYM_DEP an "." (an ".")+  — deprecated; re-typed HOST with the
  *               trailing "." dropped (ClassicTokenizer.cs:169-175)
  *
  * Notable classic behaviors (reference TestClassicAnalyzer.cs): "62.46"
  * ties HOST/NUM at equal length → HOST; "www.nutch.org." → HOST
  * "www.nutch.org"; ClassicFilter strips "'s" from APOSTROPHE tokens and
  * every "." from ACRONYM tokens ("U.S.A." → "usa").
  */
object ClassicTokenizer {

  // the jflex CJ character set (one token per char): bopomofo,
  // hiragana, katakana (+phonetic ext), CJK compat, ext-A, unified,
  // compat ideographs, halfwidth katakana
  private val CJ = "\u3100-\u312f\u3040-\u309F\u30A0-\u30FF" +
    "\u31F0-\u31FF\u3300-\u337f\u3400-\u4dbf\u4e00-\u9fff" +
    "\uf900-\ufaff\uff65-\uff9f"
  private val L = s"[\\p{L}&&[^$CJ]]"
  private val D = "\\p{Nd}"
  private val AN = s"(?:$L|$D)+"
  private val ALPHA = s"$L+"
  private val HD = s"(?:$L|$D)*$D(?:$L|$D)*" // HAS_DIGIT
  private val P = "[_\\-/.,]"

  final val TypeAlphanum = "<ALPHANUM>"
  final val TypeApostrophe = "<APOSTROPHE>"
  final val TypeAcronym = "<ACRONYM>"
  final val TypeCompany = "<COMPANY>"
  final val TypeEmail = "<EMAIL>"
  final val TypeHost = "<HOST>"
  final val TypeNum = "<NUM>"
  final val TypeCJ = "<CJ>"
  private final val TypeAcronymDep = "<ACRONYM_DEP>"

  /** (type, patterns) in rule-priority order. NUM's six jflex
    * alternations stay separate patterns so each can munch maximally —
    * a single ordered alternation would stop at the first (possibly
    * shorter) branch. */
  private val rules: Array[(String, Array[Pattern])] = Array(
    TypeAlphanum -> Array(Pattern.compile(AN)),
    TypeApostrophe -> Array(Pattern.compile(s"$ALPHA(?:'$ALPHA)+")),
    TypeAcronym -> Array(Pattern.compile(s"$L\\.(?:$L\\.)+")),
    TypeCompany -> Array(Pattern.compile(s"$ALPHA[&@]$ALPHA")),
    TypeEmail -> Array(Pattern.compile(s"$AN(?:[._\\-]$AN)*@$AN(?:[.\\-]$AN)+")),
    TypeHost -> Array(Pattern.compile(s"$AN(?:\\.$AN)+")),
    TypeNum -> Array(
      Pattern.compile(s"$AN$P$HD"),
      Pattern.compile(s"$HD$P$AN"),
      Pattern.compile(s"$AN(?:$P$HD$P$AN)+"),
      Pattern.compile(s"$HD(?:$P$AN$P$HD)+"),
      Pattern.compile(s"$AN$P$HD(?:$P$AN$P$HD)+"),
      Pattern.compile(s"$HD$P$AN(?:$P$HD$P$AN)+")),
    TypeCJ -> Array(Pattern.compile(s"[$CJ]")),
    TypeAcronymDep -> Array(Pattern.compile(s"$AN\\.(?:$AN\\.)+")))

  /** Maximal-munch scan: at each position the longest rule match wins,
    * equal lengths go to the earlier rule; unmatched chars are skipped. */
  def tokenize(s: String): Array[RawToken] = {
    val out = new ArrayBuffer[RawToken]()
    val matchers = rules.map { case (t, ps) => (t, ps.map(_.matcher(s))) }
    var i = 0
    val n = s.length
    while (i < n) {
      // every production starts with a letter or digit (CJ chars are
      // letters) — skip separators without running the 13 matchers
      val cp = s.codePointAt(i)
      if (!Character.isLetterOrDigit(cp)) {
        i += Character.charCount(cp)
      } else {
      var bestEnd = i
      var bestType: String = null
      var r = 0
      while (r < matchers.length) {
        val (tpe, ms) = matchers(r)
        var p = 0
        while (p < ms.length) {
          val m = ms(p)
          m.region(i, n)
          if (m.lookingAt() && m.end > bestEnd) { bestEnd = m.end; bestType = tpe }
          p += 1
        }
        r += 1
      }
      if (bestType == null) i += 1
      else {
        if (bestType eq TypeAcronymDep)
          // deprecated production: re-typed HOST, trailing '.' dropped
          out += RawToken(s.substring(i, bestEnd - 1), i, bestEnd - 1, TypeHost)
        else
          out += RawToken(s.substring(i, bestEnd), i, bestEnd, bestType)
        i = bestEnd
      }
      }
    }
    out.toArray
  }

  /** ClassicFilter (ClassicFilter.cs:44-77): strip trailing "'s" from
    * APOSTROPHE tokens, remove every "." from ACRONYM tokens. Offsets
    * keep the original span, like the reference. */
  def classicFilter(ts: Array[RawToken]): Array[RawToken] = ts.map { t =>
    if ((t.tpe eq TypeApostrophe) &&
        (t.term.endsWith("'s") || t.term.endsWith("'S")))
      t.copy(term = t.term.substring(0, t.term.length - 2))
    else if (t.tpe eq TypeAcronym) t.copy(term = t.term.replace(".", ""))
    else t
  }

  /** The full classic scan: tokenizer + ClassicFilter, pluggable as an
    * [[Analyzer]] tokenizer. */
  val tokenizeFiltered: String => Array[RawToken] =
    (s: String) => classicFilter(tokenize(s))

  /** ClassicAnalyzer: classic scan → lowercase → English stop (the
    * reference chain, ClassicAnalyzer.cs:115-120; max token length 255
    * with position-preserving drop, like StandardAnalyzer). */
  lazy val analyzer: Analyzer =
    new Analyzer(Analyzer.EnglishStopWords, 255, tokenizeFiltered)
}
