package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Composable post-analysis token filters (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/
  * {Shingle/ShingleFilter.cs, NGram/NGramTokenFilter.cs,
  * NGram/EdgeNGramTokenFilter.cs, CommonGrams/CommonGramsFilter.cs,
  * Reverse/ReverseStringFilter.cs, Miscellaneous/TruncateTokenFilter.cs,
  * Miscellaneous/CapitalizationFilter.cs, Miscellaneous/
  * KeywordRepeatFilter.cs + RemoveDuplicatesTokenFilter.cs,
  * Core/LengthFilter.cs, Miscellaneous/LimitTokenCountFilter.cs}).
  *
  * The reference implements these as pull TokenFilters mutating shared
  * attributes; here each is a pure `Array[Token] => Array[Token]`
  * function over the analyzer's output — the same stream semantics
  * (position increments, same-position overlap for injected tokens)
  * without the stateful chain, so they compose with `andThen` and run
  * inside the distributed indexing flatMap unchanged. Overlap accounting
  * (tokens at a repeated position) flows into [[AnalyzedDoc.numOverlap]]
  * exactly like synonym injection.
  */
object TokenFilters {

  /** ShingleFilter (ShingleFilter.cs:37-46,96-143): word n-grams of
    * `minN..maxN` adjacent tokens joined by `sep`; position gaps (stop
    * words removed upstream advance positions) are represented by the
    * filler token "_" exactly like the reference. A filler "occupies no
    * space": it carries the zero-width span (nextReal.start,
    * nextReal.start) (ShingleFilter.cs:401,447), so a shingle's offsets
    * are simply its window's (head.start, last.end) — the reference
    * test's "divide _" = (7,19) / "_ sentence" = (19,27) shapes.
    * `outputUnigrams` keeps the original tokens, with shingles
    * overlapping them at the same position. Shingles made ENTIRELY of
    * fillers are never emitted. Same-position overlap (synonyms,
    * stem-with-original) collapses to the FIRST emitted variant per
    * slot — a stated deviation: the reference's queue-based filter
    * shingles graph tokens linearly (its known non-graph behavior),
    * which we deliberately do not restate. */
  def shingle(tokens: Array[Token], minN: Int = 2, maxN: Int = 2,
      sep: String = " ", outputUnigrams: Boolean = true,
      filler: String = "_"): Array[Token] = {
    require(minN >= 2 && maxN >= minN, s"bad shingle sizes ($minN, $maxN)")
    if (tokens.isEmpty) return tokens
    // materialize the position axis: slot per position, filler where empty
    val base = tokens.head.position
    val last = tokens.last.position
    val slots = Array.fill[Token](last - base + 1)(null)
    tokens.foreach { t =>
      val s = t.position - base
      if (slots(s) == null) slots(s) = t // first token per slot wins
    }
    val line = new Array[Token](slots.length)
    val isFiller = new Array[Boolean](slots.length)
    var nextRealStart = -1
    for (i <- (slots.length - 1) to 0 by -1) {
      if (slots(i) != null) { line(i) = slots(i); nextRealStart = slots(i).startOff }
      else {
        line(i) = Token(filler, base + i, nextRealStart, nextRealStart)
        isFiller(i) = true
      }
    }
    val out = new ArrayBuffer[Token](line.length * (maxN - minN + 2))
    var i = 0
    while (i < line.length) {
      val t = line(i)
      if (!isFiller(i) && outputUnigrams) out += t
      var n = minN
      while (n <= maxN && i + n <= line.length) {
        // shingles may BEGIN or END with fillers (the reference's
        // stop-gap bigrams "divide _" / "_ sentence"); only an
        // all-filler window is dropped
        if (!(i until i + n).forall(isFiller)) {
          val text = line.slice(i, i + n).map(_.term).mkString(sep)
          out += Token(text, t.position, line(i).startOff, line(i + n - 1).endOff)
        }
        n += 1
      }
      i += 1
    }
    out.toArray
  }

  /** NGramTokenFilter (NGramTokenFilter.cs:31 — "emits all n-grams for
    * the same token at the same position"): every contiguous character
    * run of length `minG..maxG` per token, all sharing the source
    * token's position and offsets (4.4+ behavior). */
  def nGrams(tokens: Array[Token], minG: Int, maxG: Int): Array[Token] = {
    require(minG >= 1 && maxG >= minG, s"bad gram sizes ($minG, $maxG)")
    tokens.flatMap { t =>
      val cps = t.term.codePointCount(0, t.term.length)
      for {
        g <- minG to math.min(maxG, cps)
        s <- 0 to cps - g
      } yield {
        val a = t.term.offsetByCodePoints(0, s)
        val b = t.term.offsetByCodePoints(0, s + g)
        Token(t.term.substring(a, b), t.position, t.startOff, t.endOff)
      }
    }
  }

  /** EdgeNGramTokenFilter (EdgeNGramTokenFilter.cs, FRONT side): the
    * leading `minG..maxG`-codepoint prefixes of each token, sharing its
    * position and offsets. */
  def edgeNGrams(tokens: Array[Token], minG: Int, maxG: Int): Array[Token] = {
    require(minG >= 1 && maxG >= minG, s"bad gram sizes ($minG, $maxG)")
    tokens.flatMap { t =>
      val cps = t.term.codePointCount(0, t.term.length)
      (minG to math.min(maxG, cps)).map { g =>
        Token(t.term.substring(0, t.term.offsetByCodePoints(0, g)),
          t.position, t.startOff, t.endOff)
      }
    }
  }

  /** CommonGramsFilter (CommonGramsFilter.cs:87-97): for each adjacent
    * pair where EITHER word is common, emit "w1_w2" alongside both
    * originals — "man of the year" adds man_of, of_the, the_year. The
    * gram is emitted with posIncr 0 directly AFTER the first word
    * (GramToken(), CommonGramsFilter.cs:201), so it shares the FIRST
    * word's position and spans (w1.start, w2.end). Only directly
    * adjacent positions pair (a stop-gap breaks adjacency, matching the
    * reference's posIncr handling). */
  def commonGrams(tokens: Array[Token], commonWords: Set[String],
      sep: String = "_"): Array[Token] = {
    val out = new ArrayBuffer[Token](tokens.length * 2)
    var i = 0
    while (i < tokens.length) {
      val t = tokens(i)
      out += t
      if (i + 1 < tokens.length) {
        val nxt = tokens(i + 1)
        if (nxt.position == t.position + 1 &&
            (commonWords.contains(t.term) || commonWords.contains(nxt.term))) {
          out += Token(t.term + sep + nxt.term, t.position, t.startOff, nxt.endOff)
        }
      }
      i += 1
    }
    out.toArray
  }

  /** ReverseStringFilter (Reverse/ReverseStringFilter.cs:59-74):
    * codepoint-safe reversal — the index-time half of leading-wildcard
    * support (`*able` becomes a PREFIX seek over reversed terms). */
  def reverse(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = s.length
    while (i > 0) {
      val cp = s.codePointBefore(i)
      sb.appendCodePoint(cp)
      i -= Character.charCount(cp)
    }
    sb.toString
  }

  /** TruncateTokenFilter (Miscellaneous/TruncateTokenFilter.cs): clip
    * terms to `len` codepoints. */
  def truncate(tokens: Array[Token], len: Int): Array[Token] = {
    require(len >= 1, "length must be >= 1")
    tokens.map { t =>
      val cps = t.term.codePointCount(0, t.term.length)
      if (cps <= len) t
      else t.copy(term = t.term.substring(0, t.term.offsetByCodePoints(0, len)))
    }
  }

  /** CapitalizationFilter (Miscellaneous/CapitalizationFilter.cs,
    * default onlyFirstWord): uppercase the first codepoint, lowercase
    * the rest. */
  def capitalize(s: String): String =
    if (s.isEmpty) s
    else {
      val first = s.offsetByCodePoints(0, 1)
      s.substring(0, first).toUpperCase(java.util.Locale.ROOT) +
        Analyzer.lowerCase(s.substring(first))
    }

  /** LengthFilter (Core/LengthFilter.cs — a FilteringTokenFilter):
    * drop terms outside [min, max] codepoints; positions are preserved
    * (the dropped slot leaves a gap), like the stop filter. */
  def lengthFilter(tokens: Array[Token], min: Int, max: Int): Array[Token] =
    tokens.filter { t =>
      val cps = t.term.codePointCount(0, t.term.length)
      cps >= min && cps <= max
    }

  /** LimitTokenCountFilter (Miscellaneous/LimitTokenCountFilter.cs):
    * keep only the first `n` tokens. */
  def limitTokenCount(tokens: Array[Token], n: Int): Array[Token] =
    tokens.take(n)

  /** KeywordRepeatFilter + stemmer + RemoveDuplicatesTokenFilter
    * (Miscellaneous/KeywordRepeatFilter.cs + RemoveDuplicatesTokenFilter
    * .cs): emit the ORIGINAL term and its stem at the same position —
    * exact-match precision and stemmed recall in one index — dropping
    * the duplicate when stemming is identity. The repeated token is
    * same-position overlap (posIncr 0), counted like synonym injection. */
  def stemWithOriginal(tokens: Array[Token], stem: String => String): Array[Token] =
    tokens.flatMap { t =>
      val s = stem(t.term)
      if (s == t.term) Array(t)
      else Array(t, t.copy(term = s))
    }

  /** DictionaryCompoundWordTokenFilter (Compound/
    * DictionaryCompoundWordTokenFilter.cs:96-131 + base
    * CompoundWordTokenFilterBase.cs:108-142,190-204): Germanic
    * decompounding — "donaudampfschiff" also indexes "donau", "dampf",
    * "schiff" so a "schiff" query finds it. Reference semantics
    * preserved exactly: only tokens of length >= `minWordSize` are
    * decomposed; the brute-force scan tries every start i and every
    * length j in [minSubwordSize, maxSubwordSize] IN THAT ORDER (subword
    * emission order = start asc, then length asc); `onlyLongestMatch`
    * keeps only the longest dictionary hit per start; the ORIGINAL token
    * is always emitted first, subwords follow at the same position
    * (posIncr 0, overlap like synonyms) and carry the ORIGINAL word's
    * offsets (the >=4.4 behavior — subword offsets are not narrowed).
    * The dictionary is caller-supplied (the reference loads a user word
    * list); match is exact against the already-filtered term text. */
  def dictionaryCompound(tokens: Array[Token], dictionary: Set[String],
                         minWordSize: Int = 5, minSubwordSize: Int = 2,
                         maxSubwordSize: Int = 15,
                         onlyLongestMatch: Boolean = false): Array[Token] =
    tokens.flatMap { t =>
      val out = ArrayBuffer(t)
      val len = t.term.length
      if (len >= minWordSize) {
        var i = 0
        while (i <= len - minSubwordSize) {
          var longest: String = null
          var j = minSubwordSize
          while (j <= maxSubwordSize && i + j <= len) {
            val sub = t.term.substring(i, i + j)
            if (dictionary.contains(sub)) {
              if (onlyLongestMatch) {
                if (longest == null || longest.length < j) longest = sub
              } else out += t.copy(term = sub)
            }
            j += 1
          }
          if (onlyLongestMatch && longest != null) out += t.copy(term = longest)
          i += 1
        }
      }
      out
    }

  /** SetKeywordMarkerFilter / PatternKeywordMarkerFilter + the stemmers'
    * KeywordAttribute contract (Miscellaneous/SetKeywordMarkerFilter.cs,
    * PatternKeywordMarkerFilter.cs; every reference stemmer starts with
    * `if (!keywordAttr.IsKeyword)`): protected words pass through the
    * wrapped stemmer untouched. The reference marks an attribute the
    * downstream filter consults; here the protection composes directly
    * onto our `String => String` stemmer hook — same chain semantics,
    * no shared mutable attribute. */
  def keywordMarker(stem: String => String, keywords: Set[String] = Set.empty,
                    pattern: Option[String] = None): String => String = {
    val p = pattern.map(java.util.regex.Pattern.compile(_))
    w => if (keywords.contains(w) || p.exists(_.matcher(w).matches())) w
         else stem(w)
  }

  /** StemmerOverrideFilter (Miscellaneous/StemmerOverrideFilter.cs): a
    * word→stem dictionary consulted FIRST; a hit emits the override and
    * marks the token keyword so no later stemmer re-stems it — exactly
    * the short-circuit below. */
  def stemmerOverride(overrides: Map[String, String], stem: String => String,
                      ignoreCase: Boolean = false): String => String = {
    // Locale.ROOT like the rest of the analysis package: a tr/az default
    // JVM locale would fold I → dotless ı on one side only and silently
    // never match
    val root = java.util.Locale.ROOT
    val dict = if (ignoreCase) overrides.map { case (k, v) => (k.toLowerCase(root), v) }
               else overrides
    w => dict.getOrElse(if (ignoreCase) w.toLowerCase(root) else w, stem(w))
  }
}
