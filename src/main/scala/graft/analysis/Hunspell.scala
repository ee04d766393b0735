package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Hunspell affix-dictionary stemming — the user-supplied-dictionary
  * stemmer family (reference: Analysis.Common/Analysis/Hunspell/
  * {Dictionary.cs, Stemmer.cs, HunspellStemFilter.cs}; the reference
  * ships NO dictionaries — the user loads a .aff/.dic pair, exactly this
  * module's contract).
  *
  * Scope (documented subset): the single-prefix + single-suffix model
  * with cross-product rules and bracket-class conditions — the layer
  * `Stemmer.Stem` applies at recursion depth 0, which is what en/es/fr
  * style dictionaries use for stemming. Deliberately out (rarely used
  * for STEMMING and each is a config flag a future round can add):
  * continuation classes (twofold suffixes), COMPLEXPREFIXES, CIRCUMFIX,
  * ICONV/OCONV input cleaning, numeric/long flag formats, and
  * compounding. The parser accepts (and strips) `affix/continuation`
  * syntax so real dictionaries still load.
  *
  * Stemmer semantics preserved from Stemmer.cs:
  *   - a word that IS a dictionary entry stems to itself first
  *     (Stem() adds the direct lookup before affix stripping);
  *   - suffix rule (flag, strip, affix, cond): word ends with affix →
  *     candidate = word − affix + strip, valid iff candidate matches
  *     cond at its END and the candidate's dictionary flags contain
  *     flag;
  *   - prefix rule: symmetric at the start;
  *   - cross-product: a prefix AND a suffix strip together only when
  *     BOTH rules are cross-product and the base carries BOTH flags
  *     (Stemmer.cs prefixFlag cross-check);
  *   - filter semantics (HunspellStemFilter.cs:101-140): unknown word →
  *     token unchanged; known → first stem replaces the token, the rest
  *     overlap at posIncr 0; dedup on by default; longestOnly keeps the
  *     single longest stem (tie: lexicographically greatest — the
  *     reference's lengthComparer).
  */
object Hunspell {

  /** One PFX/SFX line. `cond` is the raw hunspell condition pattern
    * (literals, `[...]`, `[^...]`, `.`); compiled lazily to an anchored
    * regex at the matching end. */
  final case class AffixRule(flag: Char, strip: String, affix: String,
                             cond: String, crossProduct: Boolean) {
    // hunspell bracket conditions are literal character LISTS, so a mid-
    // class '-' must not become a regex range — the reference escapes it
    // before compiling (Dictionary.cs:461 condition.Replace("-", "\\-"))
    private[Hunspell] lazy val condEsc = cond.replace("-", "\\-")
    private[Hunspell] lazy val suffixRe =
      if (cond == ".") null else java.util.regex.Pattern.compile("(?s).*" + condEsc + "$")
    private[Hunspell] lazy val prefixRe =
      if (cond == ".") null else java.util.regex.Pattern.compile("(?s)^" + condEsc + ".*")
  }

  final case class Dict(words: Map[String, Set[Char]],
                        prefixes: Seq[AffixRule], suffixes: Seq[AffixRule],
                        ignoreCase: Boolean = false)

  /** Parse a .aff + .dic pair (Dictionary.cs ParseAffix/ParseDictionary
    * restated for the subset): SFX/PFX headers `KIND flag Y|N count`
    * followed by `KIND flag strip affix condition`, `0` meaning empty,
    * `affix/continuation` stripped of its continuation part; .dic first
    * line = count, then `word/FLAGS`. `#` comments and blank lines
    * ignored. */
  def parse(aff: String, dic: String, ignoreCase: Boolean = false): Dict = {
    val pfx = ArrayBuffer.empty[AffixRule]
    val sfx = ArrayBuffer.empty[AffixRule]
    val cross = scala.collection.mutable.HashMap.empty[(String, Char), Boolean]
    for (line <- aff.linesIterator.map(_.trim)
         if line.nonEmpty && !line.startsWith("#")) {
      val parts = line.split("\\s+")
      if ((parts(0) == "PFX" || parts(0) == "SFX") && parts.length >= 4) {
        val flag = parts(1).head
        // header: PFX flag Y/N count (the cross-product column is always
        // Y or N — without that guard a zero-affix rule `SFX X a 0 .`
        // would be swallowed as a header)
        if ((parts(2) == "Y" || parts(2) == "N") && parts(3).forall(_.isDigit))
          cross((parts(0), flag)) = parts(2) == "Y"
        else {
          val strip = if (parts(2) == "0") "" else parts(2)
          // continuation classes strip FIRST, then '0' means empty — the
          // reference's order (Dictionary.cs), so `0/YZ` is the zero
          // affix, not a literal '0'
          val affix0 = parts(3).takeWhile(_ != '/')
          val affix = if (affix0 == "0") "" else affix0
          val cond = if (parts.length > 4) parts(4) else "."
          val rule = AffixRule(flag, strip, affix, cond,
            cross.getOrElse((parts(0), flag), false))
          if (parts(0) == "PFX") pfx += rule else sfx += rule
        }
      }
    }
    val words = dic.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#") && !l.forall(_.isDigit))
      .map { l0 =>
        // trailing morphological fields (`word/FLAGS po:verb`) are cut at
        // the first tab/space, like the reference (Dictionary.cs:828-840)
        // — otherwise they pollute the flag set (or the word itself)
        val cut = l0.indexWhere(c => c == '\t' || c == ' ')
        val l = if (cut < 0) l0 else l0.substring(0, cut)
        val slash = l.indexOf('/')
        val w0 = if (slash < 0) l else l.substring(0, slash)
        val w = if (ignoreCase) w0.toLowerCase else w0
        val flags: Set[Char] = if (slash < 0) Set.empty else l.substring(slash + 1).toSet
        w -> flags
      }.toSeq.groupBy(_._1).map { case (w, fs) => w -> fs.flatMap(_._2).toSet }
    Dict(words, pfx.toSeq, sfx.toSeq, ignoreCase)
  }

  private def condEnd(r: AffixRule, base: String): Boolean =
    r.suffixRe == null || r.suffixRe.matcher(base).matches()
  private def condStart(r: AffixRule, base: String): Boolean =
    r.prefixRe == null || r.prefixRe.matcher(base).matches()

  /** All stems of `word` (Stemmer.Stem order: direct lookup first, then
    * suffix strips — each with its cross-product prefix strips — then
    * plain prefix strips), deduped like UniqueStems. */
  def stem(dict: Dict, word: String): Seq[String] = {
    val w = if (dict.ignoreCase) word.toLowerCase else word
    val out = ArrayBuffer.empty[String]
    if (dict.words.contains(w)) out += w
    for (r <- dict.suffixes
         if r.affix.nonEmpty && w.endsWith(r.affix) && w.length > r.affix.length) {
      val base = w.dropRight(r.affix.length) + r.strip
      if (base.nonEmpty && condEnd(r, base)) {
        if (dict.words.get(base).exists(_.contains(r.flag))) out += base
        if (r.crossProduct)
          for (p <- dict.prefixes
               if p.crossProduct && p.affix.nonEmpty && base.startsWith(p.affix)) {
            val base2 = p.strip + base.drop(p.affix.length)
            if (base2.nonEmpty && condStart(p, base2) &&
                dict.words.get(base2).exists(f =>
                  f.contains(p.flag) && f.contains(r.flag))) out += base2
          }
      }
    }
    for (p <- dict.prefixes
         if p.affix.nonEmpty && w.startsWith(p.affix) && w.length > p.affix.length) {
      val base = p.strip + w.drop(p.affix.length)
      if (base.nonEmpty && condStart(p, base) &&
          dict.words.get(base).exists(_.contains(p.flag))) out += base
    }
    out.distinct.toSeq
  }

  /** HunspellStemFilter as a pure token function: unknown words pass
    * through unchanged; known words are REPLACED by their first stem
    * with remaining stems overlapping at the same position;
    * `longestOnly` keeps the single longest (tie: lexicographically
    * greatest, the reference's lengthComparer). */
  def filter(dict: Dict, longestOnly: Boolean = false)
      : Array[Token] => Array[Token] =
    (tokens: Array[Token]) => tokens.flatMap { t =>
      val stems = stem(dict, t.term)
      if (stems.isEmpty) Array(t)
      else {
        val ordered =
          if (longestOnly)
            Seq(stems.maxBy(s => (s.length, s))) // length, then text desc
          else stems
        ordered.map(s => t.copy(term = s)).toArray
      }
    }
}
