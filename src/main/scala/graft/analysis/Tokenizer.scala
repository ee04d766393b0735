package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** A single token produced by the tokenizer.
  *
  * @param term     token text (original slice of the input, pre-filters)
  * @param startOff UTF-16 start offset into the input
  * @param endOff   UTF-16 end offset (exclusive)
  * @param tpe      token type (ALPHANUM / NUM / KATAKANA / ...)
  */
final case class RawToken(term: String, startOff: Int, endOff: Int, tpe: String,
                          payload: Array[Byte] = null)

/** UAX#29 (Unicode 6.3) word-break tokenizer, StandardTokenizer-equivalent.
  *
  * Brand-new implementation of the public Unicode word-boundary spec
  * (UAX#29, rules WB1-WB14) with Lucene's token-emission conventions
  * (reference behavior: /root/reference/src/Lucene.Net.Analysis.Common/
  * Analysis/Standard/StandardTokenizer.cs:198-241 and the golden vectors in
  * Lucene.Net.Tests.Analysis.Common/Analysis/Core/TestStandardAnalyzer.cs):
  *
  *  - maximal spans of ALetter/Hebrew_Letter/Numeric joined by WB5-WB13b
  *    (mid-letter ':' , mid-num ',', mid-numlet '.', single-quote '\'',
  *    extend-num-let '_') become ALPHANUM / NUM tokens;
  *  - Katakana runs join (WB13); Hangul joins via ALetter and is typed HANGUL;
  *  - ideographs and hiragana emit one token per character (IDEOGRAPHIC /
  *    HIRAGANA) — no word-break rule joins them;
  *  - complex-context (LineBreak=SA: Thai, Lao, Myanmar, Khmer, Tai) runs
  *    emit a single SOUTHEAST_ASIAN token (the JFlex {ComplexContext}+ rule);
  *  - Extend/Format characters attach to the preceding character (WB4);
  *  - everything else (punctuation, whitespace, symbols) is discarded.
  */
object UAX29Tokenizer {

  // Word-break property classes (Unicode 6.3 WordBreakProperty.txt).
  private final val Other = 0
  private final val CRc = 1
  private final val LFc = 2
  private final val Newline = 3
  private final val Extend = 4
  private final val Format = 5
  private final val Katakana = 6
  private final val ALetter = 7
  private final val HebrewLetter = 8
  private final val MidLetter = 9
  private final val MidNum = 10
  private final val MidNumLet = 11
  private final val SingleQuote = 12
  private final val DoubleQuote = 13
  private final val Numeric = 14
  private final val ExtendNumLet = 15
  private final val RegionalIndicator = 16
  private final val SEAsian = 17 // not a UAX#29 class: Lucene's ComplexContext

  // Token types (mirroring StandardTokenizer.TOKEN_TYPES)
  val ALPHANUM = "<ALPHANUM>"
  val NUM = "<NUM>"
  val SOUTHEAST_ASIAN = "<SOUTHEAST_ASIAN>"
  val IDEOGRAPHIC = "<IDEOGRAPHIC>"
  val HIRAGANA = "<HIRAGANA>"
  val KATAKANA = "<KATAKANA>"
  val HANGUL = "<HANGUL>"

  private val seaScripts: Set[Character.UnicodeScript] = {
    import Character.UnicodeScript._
    Set(THAI, LAO, MYANMAR, KHMER, TAI_LE, NEW_TAI_LUE, TAI_THAM, TAI_VIET)
  }

  private def isMidLetter(cp: Int): Boolean = cp match {
    case 0x003A | 0x00B7 | 0x05F4 | 0x0387 | 0x2027 | 0xFE13 | 0xFE55 | 0xFF1A => true
    case _ => false
  }

  private def isMidNum(cp: Int): Boolean = cp match {
    case 0x002C | 0x003B | 0x037E | 0x0589 | 0x060C | 0x060D | 0x066C | 0x07F8 |
         0x2044 | 0xFE10 | 0xFE14 | 0xFE50 | 0xFE54 | 0xFF0C | 0xFF1B => true
    case _ => false
  }

  private def isMidNumLet(cp: Int): Boolean = cp match {
    case 0x002E | 0x2018 | 0x2019 | 0x2024 | 0xFE52 | 0xFF07 | 0xFF0E => true
    case _ => false
  }

  /** Word-break class of a codepoint (Unicode 6.3 approximation backed by
    * java.lang.Character; validated against the reference golden vectors). */
  private[analysis] def wbClass(cp: Int): Int = {
    if (cp == '\r') return CRc
    if (cp == '\n') return LFc
    if (cp == 0x0B || cp == 0x0C || cp == 0x85 || cp == 0x2028 || cp == 0x2029) return Newline
    if (cp == 0x0027) return SingleQuote
    if (cp == 0x0022) return DoubleQuote
    if (cp == 0x005F) return ExtendNumLet
    val t = Character.getType(cp)
    if (t == Character.NON_SPACING_MARK || t == Character.ENCLOSING_MARK ||
        t == Character.COMBINING_SPACING_MARK || cp == 0x200C || cp == 0x200D) return Extend
    if (t == Character.FORMAT) return Format
    if (t == Character.CONNECTOR_PUNCTUATION) return ExtendNumLet
    if (isMidLetter(cp)) return MidLetter
    if (isMidNum(cp)) return MidNum
    if (isMidNumLet(cp)) return MidNumLet
    if (t == Character.DECIMAL_DIGIT_NUMBER || cp == 0x066B) return Numeric
    if (cp >= 0x1F1E6 && cp <= 0x1F1FF) return RegionalIndicator
    // Katakana: script Katakana + the WB:Katakana extras outside the script
    val script =
      try Character.UnicodeScript.of(cp)
      catch { case _: IllegalArgumentException => Character.UnicodeScript.UNKNOWN }
    if (script == Character.UnicodeScript.KATAKANA ||
        cp == 0x30FC || cp == 0xFF70 || (cp >= 0x3031 && cp <= 0x3035) ||
        cp == 0x309B || cp == 0x309C) return Katakana
    if (seaScripts.contains(script)) return SEAsian
    if (Character.isIdeographic(cp)) return Other // ideograph: single-char token
    if (script == Character.UnicodeScript.HIRAGANA) return Other // single-char token
    if (script == Character.UnicodeScript.HEBREW && Character.isLetter(cp)) return HebrewLetter
    if (Character.isAlphabetic(cp)) return ALetter
    Other
  }

  private def isAHL(c: Int): Boolean = c == ALetter || c == HebrewLetter
  private def isMidL(c: Int): Boolean = c == MidLetter || c == MidNumLet || c == SingleQuote
  private def isMidN(c: Int): Boolean = c == MidNum || c == MidNumLet || c == SingleQuote
  private def isWordy(c: Int): Boolean =
    isAHL(c) || c == Numeric || c == Katakana || c == ExtendNumLet

  /** Tokenize the input. Pure function; safe to call from executors. */
  def tokenize(text: String): Array[RawToken] = {
    val n = text.length
    if (n == 0) return Array.empty
    // 1. Decode into "effective characters": (class, cp, startOff, endOff),
    //    with Extend/Format folded into the previous char per WB4.
    val cls = new ArrayBuffer[Int](n)
    val cps = new ArrayBuffer[Int](n)
    val starts = new ArrayBuffer[Int](n)
    val ends = new ArrayBuffer[Int](n)
    var i = 0
    while (i < n) {
      val cp = text.codePointAt(i)
      val w = Character.charCount(cp)
      val c = wbClass(cp)
      if ((c == Extend || c == Format) && cls.nonEmpty &&
          cls.last != CRc && cls.last != LFc && cls.last != Newline) {
        ends(ends.length - 1) = i + w // WB4: absorb into previous
      } else {
        cls += c; cps += cp; starts += i; ends += i + w
      }
      i += w
    }
    val m = cls.length
    def c(j: Int): Int = if (j >= 0 && j < m) cls(j) else -1

    // 2. Boundary decision between effective chars j and j+1 (true = break).
    def boundary(j: Int): Boolean = {
      val l = c(j); val r = c(j + 1)
      if (l == CRc && r == LFc) return false // WB3
      if (l == CRc || l == LFc || l == Newline) return true // WB3a
      if (r == CRc || r == LFc || r == Newline) return true // WB3b
      if (isAHL(l) && isAHL(r)) return false // WB5
      if (isAHL(l) && isMidL(r) && isAHL(c(j + 2))) return false // WB6
      if (isAHL(c(j - 1)) && isMidL(l) && isAHL(r)) return false // WB7
      if (l == HebrewLetter && r == SingleQuote) return false // WB7a
      if (l == HebrewLetter && r == DoubleQuote && c(j + 2) == HebrewLetter) return false // WB7b
      if (c(j - 1) == HebrewLetter && l == DoubleQuote && r == HebrewLetter) return false // WB7c
      if (l == Numeric && r == Numeric) return false // WB8
      if (isAHL(l) && r == Numeric) return false // WB9
      if (l == Numeric && isAHL(r)) return false // WB10
      if (c(j - 1) == Numeric && isMidN(l) && r == Numeric) return false // WB11
      if (l == Numeric && isMidN(r) && c(j + 2) == Numeric) return false // WB12
      if (l == Katakana && r == Katakana) return false // WB13
      if (isWordy(l) && r == ExtendNumLet) return false // WB13a
      if (l == ExtendNumLet && isWordy(r)) return false // WB13b
      if (l == RegionalIndicator && r == RegionalIndicator) return false // WB13c
      if (l == SEAsian && r == SEAsian) return false // Lucene {ComplexContext}+
      true
    }

    // 3. Walk segments, emit tokens.
    val out = new ArrayBuffer[RawToken]()
    var segStart = 0
    var j = 0
    while (j < m) {
      if (j == m - 1 || boundary(j)) {
        emit(text, cls, cps, starts, ends, segStart, j, out)
        segStart = j + 1
      }
      j += 1
    }
    out.toArray
  }

  private def emit(text: String, cls: ArrayBuffer[Int], cps: ArrayBuffer[Int],
                   starts: ArrayBuffer[Int], ends: ArrayBuffer[Int],
                   from: Int, to: Int, out: ArrayBuffer[RawToken]): Unit = {
    var hasAHL = false; var hasNum = false; var hasKat = false
    var allHangul = true; var hasSEA = false
    var k = from
    while (k <= to) {
      val cl = cls(k)
      if (isAHL(cl)) {
        hasAHL = true
        if (Character.UnicodeScript.of(cps(k)) != Character.UnicodeScript.HANGUL)
          allHangul = false
      }
      if (cl == Numeric) hasNum = true
      if (cl == Katakana) hasKat = true
      if (cl == SEAsian) hasSEA = true
      k += 1
    }
    val s = starts(from); val e = ends(to)
    val tpe =
      if (hasAHL) { if (allHangul) HANGUL else ALPHANUM }
      else if (hasNum) NUM
      else if (hasKat) KATAKANA
      else if (hasSEA) SOUTHEAST_ASIAN
      else if (from == to && Character.isIdeographic(cps(from))) IDEOGRAPHIC
      else if (from == to &&
               Character.UnicodeScript.of(cps(from)) == Character.UnicodeScript.HIRAGANA) HIRAGANA
      else null
    if (tpe != null) out += RawToken(text.substring(s, e), s, e, tpe)
  }
}
