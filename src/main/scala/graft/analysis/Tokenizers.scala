package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Specialty tokenizers + small token filters from Analysis.Common not
  * already covered by [[UAX29Tokenizer]]/[[TokenFilters]] (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/). */
object Tokenizers {

  /** PathHierarchyTokenizer (Analysis/Path/PathHierarchyTokenizer.cs):
    * "/a/b/c" → "/a", "/a/b", "/a/b/c", all stacked at one position
    * (posIncr 1,0,0,...  = position 0 for all here), each token's offsets
    * [startPosition, end); `skip` drops the leading N parts (the skipped
    * prefix moves startPosition past it — "/a/b/c" skip=1 → "/b"(2,4),
    * "/b/c"(2,6)); a trailing delimiter yields a final
    * delimiter-terminated token; `replacement` substitutes the delimiter
    * in the OUTPUT text only. */
  def pathHierarchy(s: String, delimiter: Char = '/',
                    replacement: Char = '/', skip: Int = 0): Array[Token] = {
    if (s.isEmpty) return Array.empty
    // boundaries: each non-leading delimiter index, plus the string end
    val ends = ArrayBuffer.empty[Int]
    var i = 1
    while (i < s.length) { if (s.charAt(i) == delimiter) ends += i; i += 1 }
    ends += s.length
    // start: after the skip-th part = at the delimiter preceding part skip+1
    val delims = (0 until s.length).filter(s.charAt(_) == delimiter)
    val partStarts = // index where each part's preceding delimiter sits
      (if (s.head == delimiter) delims else -1 +: delims).toIndexedSeq
    if (skip > 0 && skip >= partStarts.length) return Array.empty
    val start = if (skip == 0) 0 else partStarts(skip)
    ends.toArray.filter(_ > start).map { e =>
      Token(s.substring(start, e).replace(delimiter, replacement), 0, start, e)
    }
  }

  /** ReversePathHierarchyTokenizer
    * (Analysis/Path/ReversePathHierarchyTokenizer.cs:137-198): suffix
    * paths — "/a/b/c" → "/a/b/c"(0,6), "a/b/c"(1,6), "b/c"(3,6),
    * "c"(5,6); `skip` trims N parts off the END (endPosition moves to
    * the delimiter position count-1-skip, keeping the trailing
    * delimiter: skip=1 → "/a/b/", "a/b/", "b/"). */
  def reversePathHierarchy(s: String, delimiter: Char = '/',
                           replacement: Char = '/', skip: Int = 0): Array[Token] = {
    if (s.isEmpty) return Array.empty
    val positions = ArrayBuffer(0)
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == delimiter) positions += i + 1
      i += 1
    }
    if (positions.last < s.length) positions += s.length
    val count = positions.length
    val endIdx = count - 1 - skip
    if (endIdx < 0) return Array.empty
    val endPosition = positions(endIdx)
    val replaced = s.replace(delimiter, replacement)
    (0 until count - skip - 1).map { k =>
      val start = positions(k)
      Token(replaced.substring(start, endPosition), 0, start, endPosition)
    }.toArray
  }

  /** KeepWordFilter (Analysis/Miscellaneous/KeepWordFilter.cs): keep
    * only terms in the set; position increments preserved (positions
    * already absolute here, so dropped tokens simply vanish). */
  def keepWords(ts: Array[Token], keep: Set[String]): Array[Token] =
    ts.filter(t => keep.contains(t.term))

  /** TypeTokenFilter (Analysis/Core/TypeTokenFilter.cs) over RawTokens:
    * drop (or keep-only, useWhitelist) tokens by type. */
  def byType(ts: Array[RawToken], types: Set[String],
             useWhitelist: Boolean = false): Array[RawToken] =
    ts.filter(t => types.contains(t.tpe) == useWhitelist)

  /** TrimFilter (Analysis/Miscellaneous/TrimFilter.cs, 4.4+ semantics:
    * offsets unchanged): strip leading/trailing whitespace from the
    * term text. */
  def trim(ts: Array[Token]): Array[Token] =
    ts.map(t => t.copy(term = t.term.trim))

  /** PositionFilter (Analysis/Position/PositionFilter.cs): the first
    * token keeps its position, every later token advances by
    * `increment` (default 0 — all tokens share one position, the
    * query-side phrase-flattening trick). */
  def positionFilter(ts: Array[Token], increment: Int = 0): Array[Token] =
    if (ts.isEmpty) ts
    else {
      var pos = ts.head.position
      ts.head +: ts.tail.map { t => pos += increment; t.copy(position = pos) }
    }

  // --------------------------------------------------------------
  // UAX29URLEmailTokenizer (Analysis/Standard/UAX29URLEmailTokenizer.cs)
  // --------------------------------------------------------------

  // The reference compiles the full RFC 3986/5321 grammars into its
  // JFlex scanner; this restatement recognizes the same common shapes
  // (scheme://..., www.-led hosts, user@host emails) with documented
  // simplifications: no IP-literal hosts, no quoted local parts, and
  // the URL tail is the greedy non-space run — RFC 3986 admits ','
  // ')' '.' etc. as path/query sub-delims, so trailing sentence
  // punctuation after a URL is swallowed into the token where the
  // reference's DFA may end the token at the last structurally-valid
  // char instead ("https://ex.com," → one token here, two there).
  private val UrlRe =
    """(?i)\b(?:[a-z][a-z0-9+.-]*://|www\.)[^\s<>"]+""".r
  private val EmailRe =
    """(?i)\b[a-z0-9!#$%&'*+/=?^_`{|}~.-]+@[a-z0-9](?:[a-z0-9-]*[a-z0-9])?(?:\.[a-z0-9](?:[a-z0-9-]*[a-z0-9])?)+""".r

  val UrlType = "<URL>"
  val EmailType = "<EMAIL>"

  /** URLs and emails emerge as single tokens typed &lt;URL&gt;/&lt;EMAIL&gt;;
    * the text between matches goes through the standard UAX#29 engine.
    * Emails are matched first like the reference grammar's longest-match
    * precedence inside a URL-free region. */
  def urlEmailTokenize(s: String): Array[RawToken] = {
    val special = (UrlRe.findAllMatchIn(s).map(m => (m.start, m.end, UrlType)) ++
      EmailRe.findAllMatchIn(s).map(m => (m.start, m.end, EmailType)))
      .toArray.sortBy(m => (m._1, -(m._2 - m._1)))
    // drop overlaps (first/longest wins)
    val picked = ArrayBuffer.empty[(Int, Int, String)]
    for (m <- special) if (picked.isEmpty || m._1 >= picked.last._2) picked += m
    val out = ArrayBuffer.empty[RawToken]
    var pos = 0
    def plain(a: Int, b: Int): Unit =
      if (b > a) out ++= UAX29Tokenizer.tokenize(s.substring(a, b))
        .map(t => t.copy(startOff = t.startOff + a, endOff = t.endOff + a))
    for ((a, b, tpe) <- picked) {
      plain(pos, a)
      out += RawToken(s.substring(a, b), a, b, tpe)
      pos = b
    }
    plain(pos, s.length)
    out.toArray
  }

  /** PatternTokenizer (Analysis/Pattern/PatternTokenizer.cs): regex-driven
    * tokenization. `group = -1` is split semantics — tokens are the
    * non-empty stretches BETWEEN matches; `group >= 0` emits that
    * capturing group of every match. Zero-length tokens are never
    * emitted (the reference's guard), and a group that did not
    * participate in its match is skipped. Returns a reusable tokenizer
    * (pattern compiled once; rides the task closure). */
  def patternTokenizer(regex: String, group: Int = -1): String => Array[RawToken] = {
    val p = java.util.regex.Pattern.compile(regex)
    val groupCount = p.matcher("").groupCount()
    require(group <= groupCount,
      s"invalid group specified: pattern only has $groupCount capturing groups")
    s => {
      val out = ArrayBuffer.empty[RawToken]
      val m = p.matcher(s)
      if (group >= 0) {
        while (m.find()) {
          val st = m.start(group)
          val en = m.end(group)
          if (st >= 0 && en > st)
            out += RawToken(s.substring(st, en), st, en, UAX29Tokenizer.ALPHANUM)
        }
      } else {
        var last = 0
        while (m.find()) {
          if (m.start > last)
            out += RawToken(s.substring(last, m.start), last, m.start,
              UAX29Tokenizer.ALPHANUM)
          last = m.end
        }
        if (last < s.length)
          out += RawToken(s.substring(last), last, s.length, UAX29Tokenizer.ALPHANUM)
      }
      out.toArray
    }
  }

  /** KeywordTokenizer (Analysis/Core/KeywordTokenizer.cs): the whole
    * input as one token. */
  def keyword(s: String): Array[RawToken] =
    if (s.isEmpty) Array.empty
    else Array(RawToken(s, 0, s.length, "word"))

  /** CharTokenizer family (Analysis/Core/CharTokenizer.cs + Letter/
    * Whitespace/LowerCaseTokenizer): maximal runs of accepted chars.
    * Lowercasing belongs to the chain's LowerCaseFilter stage (the
    * LowerCaseTokenizer fusion is an optimization, not a semantic). */
  def charTokenize(accept: Int => Boolean)(s: String): Array[RawToken] = {
    val out = new ArrayBuffer[RawToken]()
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (accept(cp)) {
        val start = i
        var j = i
        while (j < n && accept(s.codePointAt(j))) j += Character.charCount(s.codePointAt(j))
        out += RawToken(s.substring(start, j), start, j, "word")
        i = j
      } else i += Character.charCount(cp)
    }
    out.toArray
  }

  /** LetterTokenizer: runs of Unicode letters. */
  val letterTokenize: String => Array[RawToken] =
    charTokenize(Character.isLetter)(_)

  /** WhitespaceTokenizer: runs of non-whitespace. */
  val whitespaceTokenize: String => Array[RawToken] =
    charTokenize(cp => !Character.isWhitespace(cp))(_)

  /** NGramTokenizer (Analysis/NGram/NGramTokenizer.cs, 4.4 semantics):
    * all codepoint n-grams of sizes [minGram, maxGram] over the raw
    * input, start-major then increasing size — "abcde" (1,2) → a, ab, b,
    * bc, c, cd, d, de, e. Every gram advances the position (the 4.4
    * tokenizer's posIncr is always 1). */
  def ngramTokenize(minGram: Int, maxGram: Int)(s: String): Array[RawToken] = {
    require(minGram >= 1 && minGram <= maxGram, "invalid gram range")
    // codepoint start offsets
    val starts = new ArrayBuffer[Int]()
    var i = 0
    while (i < s.length) { starts += i; i += Character.charCount(s.codePointAt(i)) }
    starts += s.length
    val out = new ArrayBuffer[RawToken]()
    var a = 0
    val ncp = starts.length - 1
    while (a < ncp) {
      var g = minGram
      while (g <= maxGram && a + g <= ncp) {
        out += RawToken(s.substring(starts(a), starts(a + g)), starts(a), starts(a + g), "word")
        g += 1
      }
      a += 1
    }
    out.toArray
  }

  /** EdgeNGramTokenizer (Analysis/NGram/EdgeNGramTokenizer.cs, FRONT) and
    * the deprecated BACK side (Lucene43EdgeNGramTokenizer) — "abcde"
    * (1,3) → a, ab, abc / e, de, cde. */
  def edgeNGramTokenize(minGram: Int, maxGram: Int, back: Boolean = false)
      (s: String): Array[RawToken] = {
    require(minGram >= 1 && minGram <= maxGram, "invalid gram range")
    val starts = new ArrayBuffer[Int]()
    var i = 0
    while (i < s.length) { starts += i; i += Character.charCount(s.codePointAt(i)) }
    starts += s.length
    val ncp = starts.length - 1
    val out = new ArrayBuffer[RawToken]()
    var g = minGram
    while (g <= maxGram && g <= ncp) {
      if (back) out += RawToken(s.substring(starts(ncp - g), s.length), starts(ncp - g), s.length, "word")
      else out += RawToken(s.substring(0, starts(g)), 0, starts(g), "word")
      g += 1
    }
    out.toArray
  }
}
