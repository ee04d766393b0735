package graft.analysis

import java.util.regex.Pattern
import scala.collection.mutable.ArrayBuffer

/** The output of a char filter: the rewritten text plus the reference's
  * BaseCharFilter offset-correction table (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/CharFilter/
  * BaseCharFilter.cs:45-108) — a sorted (outputOffset, cumulativeDiff)
  * map where `correct(o)` = o + diff of the LAST entry with offset <= o
  * (identity before the first entry), so token offsets computed over the
  * rewritten text map back to the ORIGINAL text for highlighting and the
  * offsets sidecar. */
final case class FilteredText(text: String, offsets: Array[Int],
                              diffs: Array[Int]) {
  def correct(off: Int): Int =
    if (offsets.length == 0 || off < offsets(0)) off
    else if (off >= offsets(offsets.length - 1)) off + diffs(diffs.length - 1)
    else {
      var lo = 0
      var hi = offsets.length - 1
      while (lo < hi) { // last entry with offsets(idx) <= off
        val mid = (lo + hi + 1) >>> 1
        if (offsets(mid) <= off) lo = mid else hi = mid - 1
      }
      off + diffs(lo)
    }
}

/** CharFilter analogs — pre-tokenization text rewrites with offset
  * correction. Pure `String => FilteredText` functions: map-only at any
  * corpus scale, the rules/patterns ride the task closure. */
object CharFilters {

  /** AddOffCorrectMap (BaseCharFilter.cs:86-108): append monotonically;
    * a repeat of the last offset overwrites its diff. */
  private final class Corrections {
    private val offs = new ArrayBuffer[Int]()
    private val dfs = new ArrayBuffer[Int]()
    def last: Int = if (dfs.isEmpty) 0 else dfs(dfs.length - 1)
    def add(off: Int, cumulativeDiff: Int): Unit =
      if (offs.nonEmpty && off == offs(offs.length - 1))
        dfs(dfs.length - 1) = cumulativeDiff
      else { offs += off; dfs += cumulativeDiff }
    def done(text: String) = FilteredText(text, offs.toArray, dfs.toArray)
  }

  /** MappingCharFilter (MappingCharFilter.cs:66-190): greedy
    * LONGEST-match rewrite over a rule map. At every input position the
    * longest matching key wins; its replacement is emitted verbatim and
    * never re-scanned (no cascading). Correction bookkeeping is the
    * reference's exactly: a shrinking match adds ONE entry at the output
    * position past the replacement; a growing match adds one entry per
    * extra output char, stepping the diff down — so correct() of a token
    * end inside the growth collapses onto the original span. */
  def mapping(rules: Map[String, String]): String => FilteredText = {
    require(rules.keys.forall(_.nonEmpty), "empty mapping key")
    // longest-first per leading char = greedy longest match without an FST
    val byFirst: Map[Char, Array[(String, String)]] =
      rules.toArray.groupBy(_._1.charAt(0))
        .map { case (c, rs) => c -> rs.sortBy(-_._1.length) }
    s => {
      val corr = new Corrections
      val out = new java.lang.StringBuilder(s.length)
      var inputOff = 0
      while (inputOff < s.length) {
        var matched: (String, String) = null
        byFirst.get(s.charAt(inputOff)) match {
          case Some(cands) =>
            var i = 0
            while (i < cands.length && matched == null) {
              if (s.startsWith(cands(i)._1, inputOff)) matched = cands(i)
              i += 1
            }
          case None =>
        }
        if (matched == null) {
          out.append(s.charAt(inputOff))
          inputOff += 1
        } else {
          inputOff += matched._1.length
          val diff = matched._1.length - matched._2.length
          if (diff != 0) {
            val prev = corr.last
            if (diff > 0) corr.add(inputOff - diff - prev, prev + diff)
            else {
              val outputStart = inputOff - prev
              var e = 0
              while (e < -diff) { corr.add(outputStart + e, prev - e - 1); e += 1 }
            }
          }
          out.append(matched._2)
        }
      }
      corr.done(out.toString)
    }
  }

  /** PatternReplaceCharFilter (Pattern/PatternReplaceCharFilter.cs:
    * 86-135): regex replace-all with `$n` group references, corrections
    * per the reference's ProcessPattern — a shrinking replacement adds one
    * entry at its end, a growing one an entry per extra char stepping the
    * cumulative diff negative (clamped at 0 by correct()'s caller there;
    * we keep the raw table — tokens never start before offset 0 here
    * because the tokenizer only emits in-bounds spans). */
  def patternReplace(regex: String, replacement: String): String => FilteredText = {
    val pattern = Pattern.compile(regex)
    s => {
      val corr = new Corrections
      val m = pattern.matcher(s)
      val sb = new java.lang.StringBuilder
      var cumulative = 0
      var lastMatchEnd = 0
      while (m.find()) {
        val skipped = m.start - lastMatchEnd
        val lengthBefore = sb.length + skipped
        sb.append(s, lastMatchEnd, m.start)
        val groupSize = m.end - m.start
        lastMatchEnd = m.end
        appendReplacement(sb, m, replacement)
        val replacementSize = sb.length - lengthBefore
        if (groupSize != replacementSize) {
          if (replacementSize < groupSize) {
            cumulative += groupSize - replacementSize
            corr.add(lengthBefore + replacementSize, cumulative)
          } else {
            var i = groupSize
            while (i < replacementSize) {
              cumulative -= 1
              corr.add(lengthBefore + i, cumulative)
              i += 1
            }
          }
        }
      }
      sb.append(s, lastMatchEnd, s.length)
      corr.done(sb.toString)
    }
  }

  /** `$n`/`$$` substitution into the current match (java.util.regex
    * replacement grammar — the same one the reference's Regex.Replace
    * resolves). */
  private def appendReplacement(sb: java.lang.StringBuilder,
                                m: java.util.regex.Matcher,
                                replacement: String): Unit = {
    var i = 0
    while (i < replacement.length) {
      val c = replacement.charAt(i)
      if (c == '\\' && i + 1 < replacement.length) {
        sb.append(replacement.charAt(i + 1)); i += 2
      } else if (c == '$' && i + 1 < replacement.length &&
                 replacement.charAt(i + 1).isDigit) {
        var g = 0
        i += 1
        while (i < replacement.length && replacement.charAt(i).isDigit &&
               g * 10 + (replacement.charAt(i) - '0') <= m.groupCount()) {
          g = g * 10 + (replacement.charAt(i) - '0'); i += 1
        }
        val grp = m.group(g)
        if (grp != null) sb.append(grp)
      } else { sb.append(c); i += 1 }
    }
  }

  /** Wire a char filter ahead of any tokenizer (the reference's
    * Analyzer.InitReader / Tokenizer.CorrectOffset contract): tokenize
    * the rewritten text, then correct BOTH token offsets back into the
    * original text. Composes: `wrapTokenizer(f, wrapTokenizer(g, tok))`
    * applies f first, exactly like stacked CharFilters. */
  def wrapTokenizer(filter: String => FilteredText,
                    tokenizer: String => Array[RawToken]): String => Array[RawToken] =
    s => {
      val f = filter(s)
      tokenizer(f.text).map(t =>
        t.copy(startOff = f.correct(t.startOff), endOff = f.correct(t.endOff)))
    }
}
