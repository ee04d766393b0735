package graft.search

/** The spell checker's pluggable string-distance family (reference:
  * `Lucene.Net.Suggest/Spell/{LevensteinDistance, JaroWinklerDistance,
  * NGramDistance, LuceneLevenshteinDistance}.cs` — the `IStringDistance`
  * implementations `SpellChecker.StringDistance` accepts). Pure
  * `(String, String) => Double` functions: candidate sets are already
  * dictionary-seek-bounded before ranking, so per-pair Scala inside the
  * ranking map is the right tool (the same per-candidate-matcher pattern
  * the phrase/span verifiers use — never a corpus-sized UDF scan).
  * Doubles instead of the reference's floats: gates round to 6 dp and the
  * spec vectors are closed-form, so the widened precision only removes
  * float-rounding noise.
  */
object StringDistances {

  /** `LevensteinDistance.cs:36-100`: plain edit distance, similarity
    * 1 − d / max(|a|, |b|); both empty → 1, one empty → 0. */
  def levenshteinSim(target: String, other: String): Double = {
    val n = target.length; val m = other.length
    if (n == 0 || m == 0) return if (n == m) 1.0 else 0.0
    var p = Array.tabulate(n + 1)(identity)
    var d = new Array[Int](n + 1)
    var j = 1
    while (j <= m) {
      val tj = other(j - 1)
      d(0) = j
      var i = 1
      while (i <= n) {
        val cost = if (target(i - 1) == tj) 0 else 1
        d(i) = math.min(math.min(d(i - 1) + 1, p(i) + 1), p(i - 1) + cost)
        i += 1
      }
      val t = p; p = d; d = t
      j += 1
    }
    1.0 - p(n).toDouble / math.max(m, n)
  }

  /** `JaroWinklerDistance.cs:31-115` (threshold 0.7). Two deliberate
    * departures from the classic Winkler, preserved exactly: the prefix
    * bonus scales by min(0.1, 1/maxLen) — NOT a flat 0.1 — and the
    * common prefix is NOT capped at 4 (it counts up to |shorter|). */
  def jaroWinkler(s1: String, s2: String, threshold: Double = 0.7): Double = {
    val (mx, mn) = if (s1.length > s2.length) (s1, s2) else (s2, s1)
    val range = math.max(mx.length / 2 - 1, 0)
    val matchIndexes = Array.fill(mn.length)(-1)
    val matchFlags = new Array[Boolean](mx.length)
    var matches = 0
    var mi = 0
    while (mi < mn.length) {
      val c1 = mn(mi)
      var xi = math.max(mi - range, 0)
      val xn = math.min(mi + range + 1, mx.length)
      var found = false
      while (xi < xn && !found) {
        if (!matchFlags(xi) && c1 == mx(xi)) {
          matchIndexes(mi) = xi; matchFlags(xi) = true; matches += 1; found = true
        }
        xi += 1
      }
      mi += 1
    }
    if (matches == 0) return 0.0
    val ms1 = mn.indices.collect { case i if matchIndexes(i) != -1 => mn(i) }
    val ms2 = mx.indices.collect { case i if matchFlags(i) => mx(i) }
    val transpositions = ms1.indices.count(i => ms1(i) != ms2(i)) / 2
    var prefix = 0
    while (prefix < mn.length && s1(prefix) == s2(prefix)) prefix += 1
    val m = matches.toDouble
    val j = (m / s1.length + m / s2.length + (m - transpositions) / m) / 3
    if (j < threshold) j
    else j + math.min(0.1, 1.0 / mx.length) * prefix * (1 - j)
  }

  /** `NGramDistance.cs:46-130` (Kondrak 2005 n-gram distance, default
    * n=2): Levenshtein-style DP over 0-padded source n-grams with
    * fractional per-gram mismatch cost (prefix-pad positions discounted
    * from the gram width), similarity 1 − cost / max(|a|, |b|). The
    * reference's sub-n short-string branch (positional char-match ratio,
    * NOT 1−…) is preserved verbatim. */
  def ngram(nSize: Int = 2)(source: String, target: String): Double = {
    require(nSize > 0, "n > 0")
    val sl = source.length; val tl = target.length
    if (sl == 0 || tl == 0) return if (sl == tl) 1.0 else 0.0
    if (sl < nSize || tl < nSize) {
      var cost = 0
      var i = 0
      val ni = math.min(sl, tl)
      while (i < ni) { if (source(i) == target(i)) cost += 1; i += 1 }
      return cost.toDouble / math.max(sl, tl)
    }
    val sa = new Array[Char](sl + nSize - 1)
    var si = 0
    while (si < sa.length) {
      sa(si) = if (si < nSize - 1) 0 else source(si - nSize + 1); si += 1
    }
    var p = Array.tabulate(sl + 1)(_.toDouble)
    var d = new Array[Double](sl + 1)
    val tj = new Array[Char](nSize)
    var j = 1
    while (j <= tl) {
      if (j < nSize) {
        var ti = 0
        while (ti < nSize - j) { tj(ti) = 0; ti += 1 }
        while (ti < nSize) { tj(ti) = target(ti - (nSize - j)); ti += 1 }
      } else {
        var ti = 0
        while (ti < nSize) { tj(ti) = target(j - nSize + ti); ti += 1 }
      }
      d(0) = j.toDouble
      var i = 1
      while (i <= sl) {
        var cost = 0; var tn = nSize
        var ni = 0
        while (ni < nSize) {
          if (sa(i - 1 + ni) != tj(ni)) cost += 1
          else if (sa(i - 1 + ni) == 0) tn -= 1 // discount matches on pad
          ni += 1
        }
        val ec = cost.toDouble / tn
        d(i) = math.min(math.min(d(i - 1) + 1.0, p(i) + 1.0), p(i - 1) + ec)
        i += 1
      }
      val t = p; p = d; d = t
      j += 1
    }
    1.0 - p(sl) / math.max(tl, sl)
  }

  /** `LuceneLevenshteinDistance.cs:40-100`: transposition-aware (OSA)
    * edit distance over CODEPOINTS, similarity 1 − d / min(|a|, |b|) —
    * can go negative by design (DirectSpellChecker compensates); the
    * reference's documented empty-string quirk (returns the raw LENGTH,
    * not a similarity) preserved. */
  def luceneLevenshtein(target: String, other: String): Double = {
    val t = target.codePoints.toArray
    val o = other.codePoints.toArray
    val n = t.length; val m = o.length
    if (n == 0 || m == 0) return if (n == m) 0.0 else math.max(n, m).toDouble
    val d = Array.ofDim[Int](n + 1, m + 1)
    var i = 0
    while (i <= n) { d(i)(0) = i; i += 1 }
    var j = 0
    while (j <= m) { d(0)(j) = j; j += 1 }
    j = 1
    while (j <= m) {
      i = 1
      while (i <= n) {
        val cost = if (t(i - 1) == o(j - 1)) 0 else 1
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + cost)
        if (i > 1 && j > 1 && t(i - 1) == o(j - 2) && t(i - 2) == o(j - 1))
          d(i)(j) = math.min(d(i)(j), d(i - 2)(j - 2) + cost)
        i += 1
      }
      j += 1
    }
    1.0 - d(n)(m).toDouble / math.min(m, n)
  }
}
