package graft.analysis

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** Filter-pack 2 — the remaining small token filters the reference ships
  * in Analysis.Common, restated over the engine's Array[Token]/[RawToken]
  * model (each cites its reference source):
  *
  *  - [[englishPossessive]] (En/EnglishPossessiveFilter.cs:63-76)
  *  - [[apostrophe]] (Tr/ApostropheFilter.cs:37-56)
  *  - [[upperCase]] (Core/UpperCaseFilter.cs:36-44)
  *  - [[codepointCount]] (Miscellaneous/CodepointCountFilter.cs:42-60)
  *  - [[limitTokenPosition]] (Miscellaneous/LimitTokenPositionFilter.cs:33-60)
  *  - [[cjkWidth]] (Cjk/CJKWidthFilter.cs:34-95)
  *  - [[patternReplace]] (Pattern/PatternReplaceFilter.cs:33-60)
  *  - [[patternCaptureGroups]] (Pattern/PatternCaptureGroupTokenFilter.cs:48-160)
  *  - [[commonGramsQuery]] (CommonGrams/CommonGramsQueryFilter.cs:60-120)
  *  - payload setters [[numericPayload]] / [[tokenOffsetPayload]] /
  *    [[typeAsPayload]] (Payloads/{NumericPayloadTokenFilter,
  *    TokenOffsetPayloadTokenFilter,TypeAsPayloadTokenFilter}.cs)
  *  - [[teeSink]] + the date/range/type sink predicates
  *    (Sinks/TeeSinkTokenFilter.cs, DateRecognizerSinkFilter.cs,
  *    TokenRangeSinkFilter.cs, TokenTypeSinkFilter.cs)
  */
object TokenFilters2 {

  /** EnglishPossessiveFilter: strip a trailing `'s` (apostrophe may be
    * `'`, U+2019 or U+FF07, s either case; ≥3.6 semantics). */
  def englishPossessive(ts: Array[Token]): Array[Token] = ts.map { t =>
    val s = t.term
    val n = s.length
    if (n >= 2 && (s.charAt(n - 2) == '\'' || s.charAt(n - 2) == '’' ||
        s.charAt(n - 2) == '＇') &&
        (s.charAt(n - 1) == 's' || s.charAt(n - 1) == 'S'))
      t.copy(term = s.substring(0, n - 2))
    else t
  }

  /** ApostropheFilter (Turkish): keep only the text BEFORE the first
    * `'` or U+2019 — istanbul'da → istanbul. */
  def apostrophe(ts: Array[Token]): Array[Token] = ts.map { t =>
    val i = t.term.indexWhere(c => c == '\'' || c == '’')
    if (i >= 0) t.copy(term = t.term.substring(0, i)) else t
  }

  /** UpperCaseFilter: per-codepoint uppercase (like the engine's
    * LowerCaseFilter, NOT String.toUpperCase's locale/1:N mappings). */
  def upperCase(ts: Array[Token]): Array[Token] = ts.map { t =>
    val sb = new java.lang.StringBuilder(t.term.length)
    var i = 0
    while (i < t.term.length) {
      val cp = t.term.codePointAt(i)
      sb.appendCodePoint(Character.toUpperCase(cp))
      i += Character.charCount(cp)
    }
    t.copy(term = sb.toString)
  }

  /** CodepointCountFilter: keep tokens whose CODEPOINT count (not UTF-16
    * length) is within [min, max]; a drop leaves a position gap like
    * every FilteringTokenFilter. */
  def codepointCount(ts: Array[Token], min: Int, max: Int): Array[Token] =
    ts.filter { t =>
      val n = t.term.codePointCount(0, t.term.length)
      n >= min && n <= max
    }

  /** LimitTokenPositionFilter: keep tokens at position < maxTokenPosition
    * …actually ≤ — the reference emits while `tokenPosition <=
    * maxTokenPosition` with 1-based counting over increments. */
  def limitTokenPosition(ts: Array[Token], maxTokenPosition: Int): Array[Token] =
    ts.filter(_.position < maxTokenPosition) // positions here are 0-based

  // --- CJKWidthFilter ----------------------------------------------------

  // halfwidth katakana U+FF65..FF9F → normalized fullwidth forms
  private val KanaNorm: Array[Char] = Array(
    0x30fb, 0x30f2, 0x30a1, 0x30a3, 0x30a5, 0x30a7, 0x30a9, 0x30e3, 0x30e5,
    0x30e7, 0x30c3, 0x30fc, 0x30a2, 0x30a4, 0x30a6, 0x30a8, 0x30aa, 0x30ab,
    0x30ad, 0x30af, 0x30b1, 0x30b3, 0x30b5, 0x30b7, 0x30b9, 0x30bb, 0x30bd,
    0x30bf, 0x30c1, 0x30c4, 0x30c6, 0x30c8, 0x30ca, 0x30cb, 0x30cc, 0x30cd,
    0x30ce, 0x30cf, 0x30d2, 0x30d5, 0x30d8, 0x30db, 0x30de, 0x30df, 0x30e0,
    0x30e1, 0x30e2, 0x30e4, 0x30e6, 0x30e8, 0x30e9, 0x30ea, 0x30eb, 0x30ec,
    0x30ed, 0x30ef, 0x30f3, 0x3099, 0x309A).map(_.toChar)

  // voiced (dakuten) / half-voiced (handakuten) combination deltas for
  // the preceding kana U+30A6..30FD (0 = no combination)
  private val KanaCombineVoiced: Array[Byte] = Array(
    78, 0, 0, 0, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1, 0, 1,
    0, 1, 0, 1, 0, 0, 1, 0, 1, 0, 1, 0, 0, 0, 0, 0, 0, 1, 0, 0, 1, 0, 0, 1,
    0, 0, 1, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 8, 8, 8, 8, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1)
  private val KanaCombineHalfVoiced: Array[Byte] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 2, 0, 0, 2, 0, 0, 2,
    0, 0, 2, 0, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  /** CJKWidthFilter on one term: fullwidth ASCII variants → halfwidth,
    * halfwidth katakana → fullwidth, with dakuten/handakuten marks
    * combined into the preceding kana where a precomposed form exists. */
  def cjkWidthTerm(term: String): String = {
    val text = term.toCharArray
    var length = text.length
    var i = 0
    while (i < length) {
      val ch = text(i)
      if (ch >= 0xFF01 && ch <= 0xFF5E) text(i) = (ch - 0xFEE0).toChar
      else if (ch >= 0xFF65 && ch <= 0xFF9F) {
        if ((ch == 0xFF9E || ch == 0xFF9F) && i > 0 && {
              val prev = text(i - 1)
              prev >= 0x30A6 && prev <= 0x30FD && {
                val delta = if (ch == 0xFF9F.toChar)
                  KanaCombineHalfVoiced(prev - 0x30A6)
                else KanaCombineVoiced(prev - 0x30A6)
                text(i - 1) = (prev + delta).toChar
                text(i - 1) != prev
              }
            }) {
          System.arraycopy(text, i + 1, text, i, length - i - 1)
          length -= 1
          i -= 1
        } else text(i) = KanaNorm(ch - 0xFF65)
      }
      i += 1
    }
    new String(text, 0, length)
  }

  def cjkWidth(ts: Array[Token]): Array[Token] =
    ts.map(t => t.copy(term = cjkWidthTerm(t.term)))

  // --- pattern filters ---------------------------------------------------

  /** PatternReplaceFilter: regex replace within each term (all
    * occurrences by default, like the reference's replaceAll mode). */
  def patternReplace(ts: Array[Token], regex: String, replacement: String,
      all: Boolean = true): Array[Token] = {
    val p = Pattern.compile(regex)
    ts.map { t =>
      val m = p.matcher(t.term)
      t.copy(term = if (all) m.replaceAll(replacement) else m.replaceFirst(replacement))
    }
  }

  /** PatternCaptureGroupTokenFilter: per token, emit each capture group
    * of each match of each pattern as a posIncr-0 token carrying the
    * ORIGINAL offsets. Emission order is by capture start offset across
    * patterns (ties → earlier pattern), the reference's min-offset merge.
    * Empty captures are skipped; with preserveOriginal the original stays
    * first and whole-token captures are skipped, without it the first
    * capture REPLACES the original (no duplicate original). */
  def patternCaptureGroups(ts: Array[Token], patterns: Seq[String],
      preserveOriginal: Boolean = false): Array[Token] = {
    val ps = patterns.map(Pattern.compile(_)).toArray
    val out = new ArrayBuffer[Token](ts.length)
    ts.foreach { t =>
      // per-pattern capture queues, in (match, group) order
      val queues = ps.map { p =>
        val q = new ArrayBuffer[(Int, Int)]() // (start, end)
        val m = p.matcher(t.term)
        while (m.find()) {
          var g = 1
          while (g <= m.groupCount()) {
            val (s, e) = (m.start(g), m.end(g))
            if (s >= 0 && s != e &&
                !(preserveOriginal && s == 0 && e == t.term.length))
              q += ((s, e))
            g += 1
          }
        }
        q
      }
      val heads = Array.fill(queues.length)(0)
      def nextCapture(): Option[(Int, Int)] = {
        var best = -1
        var bestStart = Int.MaxValue
        var i = 0
        while (i < queues.length) {
          if (heads(i) < queues(i).length && queues(i)(heads(i))._1 < bestStart) {
            bestStart = queues(i)(heads(i))._1; best = i
          }
          i += 1
        }
        if (best < 0) None
        else { val c = queues(best)(heads(best)); heads(best) += 1; Some(c) }
      }
      var emitted = false
      if (preserveOriginal) { out += t; emitted = true }
      var cap = nextCapture()
      if (cap.isEmpty && !preserveOriginal) { out += t; emitted = true }
      while (cap.isDefined) {
        val (s, e) = cap.get
        val term = t.term.substring(s, e)
        out += (if (!emitted) t.copy(term = term)
                else Token(term, t.position, t.startOff, t.endOff))
        emitted = true
        cap = nextCapture()
      }
    }
    out.toArray
  }

  /** CommonGramsQueryFilter: the query-side pairing of
    * [[TokenFilters.commonGrams]] — keep the grams, drop the unigrams
    * they absorbed, keep unigrams no gram covers. Runs the reference's
    * exact previous/current state machine over the CommonGrams output
    * (grams are the posIncr-0 tokens whose term contains `sep`,
    * positionally identifiable as the non-advancing emissions). */
  def commonGramsQuery(tokens: Array[Token], commonWords: Set[String],
      sep: String = "_"): Array[Token] = {
    val gf = TokenFilters.commonGrams(tokens, commonWords, sep)
    // gram = emitted at the same position as its predecessor (posIncr 0)
    val isGram = new Array[Boolean](gf.length)
    var i = 1
    while (i < gf.length) {
      isGram(i) = gf(i).position == gf(i - 1).position
      i += 1
    }
    // the reference machine: buffer `previous`; a gram CURRENT silently
    // replaces it (the absorbed unigram is dropped), a non-gram current
    // flushes it; at exhaustion the buffered token is emitted only if the
    // LAST EMISSION was not a gram (previousType check, :92-96) — so a
    // trailing unigram after a gram ("the fox" → fox) is dropped.
    val out = new ArrayBuffer[Token](gf.length)
    var prev = -1
    var lastEmittedGram = false
    var emitted = false
    i = 0
    while (i < gf.length) {
      if (prev >= 0 && !isGram(i)) {
        out += gf(prev)
        lastEmittedGram = isGram(prev)
        emitted = true
      }
      prev = i
      i += 1
    }
    if (prev >= 0 && !(emitted && lastEmittedGram)) out += gf(prev)
    // grams carried the first word's position; the query stream re-spaces
    // to posIncr 1 like the reference's PositionIncrement override
    out.iterator.zipWithIndex
      .map { case (t, p) => t.copy(position = p) }.toArray
  }

  // --- payload setters ---------------------------------------------------

  /** NumericPayloadTokenFilter: attach an encoded float payload to every
    * token matching `when` (the reference matches on token type; pass a
    * predicate since positioned Tokens carry no type). */
  def numericPayload(ts: Array[Token], value: Float,
      when: Token => Boolean = _ => true): Array[Token] = {
    val buf = java.nio.ByteBuffer.allocate(4).putFloat(value).array()
    ts.map(t => if (when(t)) t.copy(payload = buf) else t)
  }

  /** TokenOffsetPayloadTokenFilter: payload = 4-byte big-endian start
    * offset + 4-byte end offset. */
  def tokenOffsetPayload(ts: Array[Token]): Array[Token] = ts.map { t =>
    val b = java.nio.ByteBuffer.allocate(8).putInt(t.startOff).putInt(t.endOff)
    t.copy(payload = b.array())
  }

  /** TypeAsPayloadTokenFilter: payload = the token TYPE's UTF-8 bytes —
    * runs on the RawToken stage, where types live. */
  def typeAsPayload(ts: Array[RawToken]): Array[RawToken] =
    ts.map(t => t.copy(payload =
      t.tpe.getBytes(java.nio.charset.StandardCharsets.UTF_8)))

  // --- tee/sink ----------------------------------------------------------

  /** TeeSinkTokenFilter: one pass, N sinks — each sink receives the
    * tokens its predicate accepts; the primary stream is unchanged.
    * Returns (primary, sinks). */
  def teeSink(ts: Array[Token],
      sinks: Seq[Token => Boolean]): (Array[Token], Seq[Array[Token]]) =
    (ts, sinks.map(p => ts.filter(p)))

  /** DateRecognizerSinkFilter predicate: accepts tokens parseable by the
    * supplied date format (reference default: the culture's short date). */
  def dateSink(format: String = "yyyy-MM-dd"): Token => Boolean = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern(format)
    t => try { java.time.LocalDate.parse(t.term, fmt); true }
         catch { case _: java.time.format.DateTimeParseException => false }
  }

  /** TokenRangeSinkFilter predicate: accepts the tokens in stream-order
    * positions [lower, upper) — position here being the token INDEX like
    * the reference's count, not the posIncr-accumulated position. */
  def rangeSink(ts: Array[Token], lower: Int, upper: Int): Array[Token] =
    ts.slice(lower, upper)

  /** TokenTypeSinkFilter over the typed RawToken stage. */
  def typeSink(ts: Array[RawToken], tpe: String): Array[RawToken] =
    ts.filter(_.tpe == tpe)


  /** PrefixAwareTokenFilter (reference:
    * Miscellaneous/PrefixAwareTokenFilter.cs:30-100): concatenate two
    * token streams — the suffix stream's positions continue after the
    * prefix's last position and its offsets are shifted past the
    * prefix's last end offset (the reference's UpdateSuffixToken). Used
    * to mark boundaries (e.g. a sentinel token ahead of a field). */
  def prefixAware(prefix: Array[Token], suffix: Array[Token]): Array[Token] = {
    if (prefix.isEmpty) return suffix
    val lastPos = prefix.last.position
    val lastEnd = prefix.last.endOff
    prefix ++ suffix.map(t =>
      t.copy(position = t.position + lastPos + 1,
        startOff = t.startOff + lastEnd, endOff = t.endOff + lastEnd))
  }

  /** PrefixAndSuffixAwareTokenFilter (reference:
    * Miscellaneous/PrefixAndSuffixAwareTokenFilter.cs): sandwich the
    * input between a prefix and a suffix stream. */
  def prefixAndSuffixAware(prefix: Array[Token], input: Array[Token],
      suffix: Array[Token]): Array[Token] =
    prefixAware(prefixAware(prefix, input), suffix)
}
