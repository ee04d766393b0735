package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** RSLP stemmer engine (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Pt/
  * RSLPStemmerBase.cs): the rule-file interpreter behind the Portuguese
  * RSLP / RSLP-S and Galician stemmers — Orengo et al., "A Stemming
  * Algorithm for the Portuguese Language". As with Hunspell/Kuromoji,
  * the ENGINE over user-supplied step files is the contract; the
  * reference's .rslp resources are transcriptions of the published
  * paper's tables a user brings along.
  *
  * Grammar (:30-78 + the parse regexes :293-296):
  *  - step header `{ "Name", min, type, {"cond1", ...},` — words shorter
  *    than min bypass; the word must end with one of the conds (when
  *    non-empty); type 1 = whole-word exceptions, 0 = suffix exceptions;
  *    min 0 auto-computes from the rules.
  *  - rules `{"suffix", minStem}` / `{"suffix", minStem, "replacement"}`
  *    / `{"suffix", minStem, "replacement", {"exc1", ...}}`, list closed
  *    by `};`; '#' lines are comments.
  *  - Step.Apply (:237-271): FIRST matching rule fires — match = word
  *    ends with suffix AND len-|suffix| >= minStem (the stem measured
  *    BEFORE appending the replacement) AND not excepted. */
object Rslp {

  final case class Rule(suffix: String, min: Int, replacement: String,
                        exceptions: Seq[String], wholeWordExceptions: Boolean) {
    def matches(w: String): Boolean =
      w.length - suffix.length >= min && w.endsWith(suffix) && !excepted(w)
    private def excepted(w: String): Boolean =
      if (wholeWordExceptions) exceptions.contains(w)
      else exceptions.exists(w.endsWith)
    def replace(w: String): String =
      w.substring(0, w.length - suffix.length) + replacement
  }

  final case class Step(name: String, min: Int, conds: Seq[String],
                        rules: Seq[Rule]) {
    private val effMin =
      if (min != 0) min else rules.map(r => r.suffix.length + r.min).min
    def apply(w: String): String = {
      if (w.length < effMin) return w
      if (conds.nonEmpty && !conds.exists(w.endsWith)) return w
      rules.find(_.matches(w)).map(_.replace(w)).getOrElse(w)
    }
  }

  // the reference's exact patterns (:293-296) plus optional whitespace
  // before closing braces (the shipped .rslp files never use it, but a
  // hand-written table might)
  private val Header = """\{\s*"([^"]*)",\s*([0-9]+),\s*(0|1),\s*\{(.*)\},\s*""".r
  private val Strip = """\{\s*"([^"]*)",\s*([0-9]+)\s*\}\s*(,|(\}\s*;))""".r
  private val Rep = """\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)"\s*\}\s*(,|(\}\s*;))""".r
  private val Exc = """\{\s*"([^"]*)",\s*([0-9]+),\s*"([^"]*)",\s*\{(.*)\}\s*\}\s*(,|(\}\s*;))""".r

  private def parseList(s: String): Seq[String] =
    if (s.trim.isEmpty) Nil
    else s.split(",").toSeq.map(_.trim.stripPrefix("\"").stripSuffix("\""))

  /** Parse a whole .rslp-format text into its named steps. */
  def parse(text: String): Map[String, Step] = {
    val lines = text.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    val steps = ArrayBuffer.empty[Step]
    var i = 0
    while (i < lines.length) {
      lines(i) match {
        case Header(name, min, tpe, conds) =>
          val whole = tpe == "1"
          val rules = ArrayBuffer.empty[Rule]
          var closed = false
          i += 1
          while (!closed && i < lines.length) {
            val l = lines(i)
            l match {
              case Strip(suf, m, _, _) =>
                rules += Rule(suf, m.toInt, "", Nil, whole)
              case Rep(suf, m, rep, _, _) =>
                rules += Rule(suf, m.toInt, rep, Nil, whole)
              case Exc(suf, m, rep, excs, _, _) =>
                rules += Rule(suf, m.toInt, rep, parseList(excs), whole)
              case other =>
                throw new IllegalArgumentException(s"bad RSLP rule: $other")
            }
            if (l.endsWith(";")) closed = true
            i += 1
          }
          steps += Step(name, min.toInt, parseList(conds), rules.toSeq)
        case other =>
          throw new IllegalArgumentException(s"bad RSLP step header: $other")
      }
    }
    steps.map(s => s.name -> s).toMap
  }

  /** Apply named steps in order (a stemmer flow like
    * PortugueseMinimalStemmer's single Plural step or the full RSLP
    * step chain). */
  def stem(steps: Map[String, Step], flow: Seq[String])(w: String): String =
    flow.foldLeft(w)((acc, name) => steps(name).apply(acc))
}
