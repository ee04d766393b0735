package graft.analysis

import java.util.regex.Pattern
import scala.collection.mutable

/** Beider–Morse Phonetic Matching (BMPM) — the reference's last phonetic
  * encoder (`Lucene.Net.Analysis.Phonetic/Language/Bm/PhoneticEngine.cs`,
  * `Rule.cs`, `Lang.cs`, `Languages.cs`; filter `BeiderMorseFilter.cs`,
  * itself the commons-codec 1.9 engine). BMPM guesses the ORIGIN LANGUAGE
  * of a name from spelling patterns, applies language-specific
  * grapheme→phoneme rules, then approximate/exact "final" rules, and
  * emits ALL plausible phonetic renderings joined by '|' — so Schmidt
  * and Smith can land on a common token.
  *
  * The ENGINE is restated exactly below — the language-guessing rule
  * loop, the singleton-vs-any rule-map selection, the GENERIC d'/prefix
  * double encode, the per-name-type word filtering (including the
  * reference's one-word quirk of falling back to `words.First()`, not
  * `words2`), the main rules loop that DROPS unmatched characters, the
  * final-rules loop that KEEPS them, the phoneme cross-product with
  * language restriction and the maxPhonemes cap, and the sorted '|'
  * join. The RULE DATA is caller-supplied in the reference's own file
  * grammar (the shipped gen/ash/sep rule resources are data derived from
  * the original BMPM distribution — the Hunspell/Kuromoji precedent):
  * `parseRules` implements `Rule.ParseRules` (4-column lines, quotes,
  * `//` and multiline comments, `#include`), `parseLangRules` implements
  * `Lang.LoadFromResource`, and context patterns get the reference's
  * fast paths (anchored literal / prefix / suffix / one-char class)
  * with a compiled-regex `find` fallback.
  */
object BeiderMorse {

  // ---------------------------------------------------------- name types

  /** NameType.cs + PhoneticEngine.cs NAME_PREFIXES. */
  sealed abstract class NameType(val name: String, val prefixes: Set[String])
  case object Generic extends NameType("gen", Set(
    "da", "dal", "de", "del", "dela", "de la", "della", "des", "di", "do",
    "dos", "du", "van", "von"))
  case object Ashkenazi extends NameType("ash", Set(
    "bar", "ben", "da", "de", "van", "von"))
  case object Sephardic extends NameType("sep", Set(
    "al", "el", "da", "dal", "de", "del", "dela", "de la", "della", "des",
    "di", "do", "dos", "du", "van", "von"))

  sealed abstract class RuleType(val name: String)
  case object Approx extends RuleType("approx")
  case object Exact extends RuleType("exact")

  val Any = "any"
  /** PhoneticEngine.cs DEFAULT_MAX_PHONEMES. */
  val DefaultMaxPhonemes = 20

  // ------------------------------------------------------- language sets

  /** Languages.cs LanguageSet: NO_LANGUAGES / ANY_LANGUAGE / SomeLanguages. */
  sealed trait LangSet {
    def contains(l: String): Boolean
    def isEmpty: Boolean
    def isSingleton: Boolean
    def any: String
    def restrictTo(other: LangSet): LangSet
  }
  case object NoLangs extends LangSet {
    def contains(l: String) = false
    def isEmpty = true
    def isSingleton = false
    def any = throw new IllegalStateException("empty language set")
    def restrictTo(other: LangSet): LangSet = this
  }
  case object AnyLang extends LangSet {
    def contains(l: String) = true
    def isEmpty = false
    def isSingleton = false
    def any = throw new IllegalStateException("any language set")
    def restrictTo(other: LangSet): LangSet = other
  }
  final case class SomeLangs(set: Set[String]) extends LangSet {
    def contains(l: String): Boolean = set.contains(l)
    def isEmpty: Boolean = set.isEmpty
    def isSingleton: Boolean = set.size == 1
    def any: String = set.head
    def restrictTo(other: LangSet): LangSet = other match {
      case NoLangs => NoLangs
      case AnyLang => this
      case SomeLangs(o) => from(set.intersect(o))
    }
  }
  def from(set: Set[String]): LangSet =
    if (set.isEmpty) NoLangs else SomeLangs(set)

  // ------------------------------------------------------------ phonemes

  /** Rule.cs Phoneme — text + the languages it is valid in. */
  final case class Phoneme(text: String, langs: LangSet)

  /** Rule.cs IPhonemeExpr: a single phoneme or a bracketed list. */
  final case class PhonemeExpr(phonemes: Seq[Phoneme])

  // ------------------------------------------------------------ patterns

  /** Rule.cs GetPattern: the reference's specialized context matchers —
    * the general case compiles and uses `find` (the C# `Regex.Match`
    * anywhere-search). */
  private[analysis] def compileContext(regex: String): String => Boolean = {
    val startsW = regex.startsWith("^")
    val endsW = regex.endsWith("$")
    val content = regex.substring(if (startsW) 1 else 0,
      if (endsW) regex.length - 1 else regex.length)
    if (!content.contains("[")) {
      if (startsW && endsW) {
        if (content.isEmpty) (s: String) => s.isEmpty
        else (s: String) => s == content
      }
      else if ((startsW || endsW) && content.isEmpty) (_: String) => true
      else if (startsW) (s: String) => s.startsWith(content)
      else if (endsW) (s: String) => s.endsWith(content)
      else { val p = Pattern.compile(regex); (s: String) => p.matcher(s).find() }
    } else if (content.startsWith("[") && content.endsWith("]") &&
               !content.substring(1, content.length - 1).contains("[")) {
      var box = content.substring(1, content.length - 1)
      val negate = box.startsWith("^")
      if (negate) box = box.substring(1)
      val b = box
      val shouldMatch = !negate
      if (startsW && endsW)
        (s: String) => s.length == 1 && b.contains(s.charAt(0)) == shouldMatch
      else if (startsW)
        (s: String) => s.nonEmpty && b.contains(s.charAt(0)) == shouldMatch
      else if (endsW)
        (s: String) => s.nonEmpty && b.contains(s.charAt(s.length - 1)) == shouldMatch
      else { val p = Pattern.compile(regex); (s: String) => p.matcher(s).find() }
    } else {
      val p = Pattern.compile(regex)
      (s: String) => p.matcher(s).find()
    }
  }

  /** Rule.cs Rule: pattern + left/right context + phoneme expression.
    * lContext anchored with `$`, rContext with `^` — as constructed. */
  final class Rule(val pattern: String, lCon: String, rCon: String,
                   val phoneme: PhonemeExpr) extends Serializable {
    @transient private lazy val lContext = compileContext(lCon + "$")
    @transient private lazy val rContext = compileContext("^" + rCon)
    def patternAndContextMatches(input: String, i: Int): Boolean = {
      val ipl = i + pattern.length
      if (ipl > input.length) return false
      if (input.substring(i, ipl) != pattern) return false
      if (!rContext(input.substring(ipl))) return false
      lContext(input.substring(0, i))
    }
  }

  // ------------------------------------------------------------- parsing

  private def stripQuotes(s: String): String = {
    var r = s
    if (r.startsWith("\"")) r = r.substring(1)
    if (r.endsWith("\"")) r = r.substring(0, r.length - 1)
    r
  }

  /** Rule.cs ParsePhoneme: `text[lang1+lang2]` or bare text. */
  private[analysis] def parsePhoneme(ph: String): Phoneme = {
    val open = ph.indexOf("[")
    if (open >= 0) {
      require(ph.endsWith("]"), s"phoneme '$ph' has '[' but no trailing ']'")
      val before = ph.substring(0, open)
      val langs = ph.substring(open + 1, ph.length - 1).split("[+]").toSet
      Phoneme(before, from(langs))
    } else Phoneme(ph, AnyLang)
  }

  /** Rule.cs ParsePhonemeExpr: `(a|b[lang]|)` lists; a leading/trailing
    * `|` adds the empty alternative. */
  private[analysis] def parsePhonemeExpr(ph: String): PhonemeExpr = {
    if (ph.startsWith("(")) {
      require(ph.endsWith(")"), s"phoneme expr '$ph' has '(' but no ')'")
      val body = ph.substring(1, ph.length - 1)
      val phs = mutable.ArrayBuffer.empty[Phoneme]
      // Java split semantics (trailing empties dropped, leading kept) —
      // reproduces the upstream engine exactly, incl. its double-empty
      // quirk for a leading '|'
      body.split("[|]").foreach(p => phs += parsePhoneme(p))
      if (body.startsWith("|") || body.endsWith("|"))
        phs += Phoneme("", AnyLang)
      PhonemeExpr(phs.toSeq)
    } else PhonemeExpr(Seq(parsePhoneme(ph)))
  }

  /** Rule.cs ParseRules over the reference's file grammar: 4
    * whitespace-split columns (pattern, lcontext, rcontext, phoneme),
    * optional double quotes, `//` line comments, `/​*`..`*​/` extended
    * comments (full-line markers), `#include <name>` resolved through
    * `resolve`. Returns first-pattern-char → rules in FILE ORDER (first
    * match wins). */
  def parseRules(text: String, resolve: String => String,
                 location: String = "<inline>"): Map[String, Seq[Rule]] = {
    val lines = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[Rule]]
    def parseInto(t: String, loc: String): Unit = {
      var inExt = false
      for (rawLine <- t.linesIterator) {
        var line = rawLine
        if (inExt) {
          if (line.endsWith("*/")) inExt = false
        } else if (line.startsWith("/*")) {
          inExt = true
        } else {
          val cmt = line.indexOf("//")
          if (cmt >= 0) line = line.substring(0, cmt)
          line = line.trim
          if (line.nonEmpty) {
            if (line.startsWith("#include")) {
              val incl = line.substring("#include".length).trim
              require(!incl.contains(" "), s"malformed include '$rawLine' in $loc")
              parseInto(resolve(incl), s"$loc->$incl")
            } else {
              val parts = line.split("\\s+")
              require(parts.length == 4,
                s"malformed rule (${parts.length} parts): '$rawLine' in $loc")
              val r = new Rule(stripQuotes(parts(0)), stripQuotes(parts(1)),
                stripQuotes(parts(2)), parsePhonemeExpr(stripQuotes(parts(3))))
              lines.getOrElseUpdate(r.pattern.substring(0, 1),
                mutable.ArrayBuffer.empty) += r
            }
          }
        }
      }
    }
    parseInto(text, location)
    lines.view.mapValues(_.toSeq).toMap
  }

  /** Lang.cs LangRule: a regex over the name, the languages it admits or
    * excludes. */
  final case class LangRule(pattern: Pattern, langs: Set[String], accept: Boolean)

  /** Lang.cs LoadFromResource: 3 columns — pattern, `+`-joined langs,
    * true/false. */
  def parseLangRules(text: String): Seq[LangRule] = {
    val rules = mutable.ArrayBuffer.empty[LangRule]
    var inExt = false
    for (rawLine <- text.linesIterator) {
      var line = rawLine
      if (inExt) {
        if (line.endsWith("*/")) inExt = false
      } else if (line.startsWith("/*")) {
        inExt = true
      } else {
        val cmt = line.indexOf("//")
        if (cmt >= 0) line = line.substring(0, cmt)
        line = line.trim
        if (line.nonEmpty) {
          val parts = line.split("\\s+")
          require(parts.length == 3, s"malformed lang rule '$rawLine'")
          rules += LangRule(Pattern.compile(parts(0)),
            parts(1).split("[+]").toSet, parts(2) == "true")
        }
      }
    }
    rules.toSeq
  }

  /** Languages.cs GetInstance: one language name per non-comment line,
    * with the reference's stateful extended-comment tracking (the shipped
    * BMPM resources open with a multi-line license block whose interior
    * lines must not become "languages"). */
  def parseLanguages(text: String): Set[String] = {
    val out = mutable.Set.empty[String]
    var inExt = false
    for (rawLine <- text.linesIterator) {
      val line = rawLine.trim
      if (inExt) {
        if (line.endsWith("*/")) inExt = false
      } else if (line.startsWith("/*")) {
        inExt = true
      } else if (line.nonEmpty) out += line
    }
    out.toSet
  }
}

/** The PhoneticEngine (PhoneticEngine.cs) over caller-supplied rule
  * resources. `resources` resolves the reference's resource names —
  * `<nameType>_languages.txt`, `lang.txt`,
  * `<nameType>_<rules|approx|exact>_<lang>.txt` (lang incl. `any` and,
  * for final rules, `common`) — plus any `#include` targets. Missing
  * final-rule files may resolve to "" (no rules). */
final class BeiderMorse(
    nameType: BeiderMorse.NameType,
    ruleType: BeiderMorse.RuleType,
    concat: Boolean,
    resources: String => String,
    maxPhonemes: Int = BeiderMorse.DefaultMaxPhonemes) extends Serializable {
  import BeiderMorse._

  require(ruleType != null)
  private val languages: Set[String] =
    parseLanguages(resources(s"${nameType.name}_languages.txt"))
  private val langRules: Seq[LangRule] =
    parseLangRules(resources("lang.txt"))

  private def load(rt: String, lang: String): Map[String, Seq[Rule]] =
    parseRules(resources(s"${nameType.name}_${rt}_$lang.txt"), resources,
      s"${nameType.name}_${rt}_$lang.txt")

  private val mainRules: Map[String, Map[String, Seq[Rule]]] =
    (languages + Any).map(l => l -> load("rules", l)).toMap
  private val finalCommon: Map[String, Seq[Rule]] = load(ruleType.name, "common")
  private val finalPerLang: Map[String, Map[String, Seq[Rule]]] =
    (languages + Any).map(l => l -> load(ruleType.name, l)).toMap

  /** Lang.cs GuessLanguages: start from ALL candidate languages, each
    * matching rule either intersects (accept) or subtracts; empty → ANY. */
  def guessLanguages(input: String): LangSet = {
    val text = input.toLowerCase
    var langs = languages
    for (rule <- langRules if rule.pattern.matcher(text).find()) {
      if (rule.accept) langs = langs.intersect(rule.langs)
      else langs = langs.diff(rule.langs)
    }
    val ls = from(langs)
    if (ls == NoLangs) AnyLang else ls
  }

  private def rulesFor(table: Map[String, Map[String, Seq[Rule]]],
                       langs: LangSet): Map[String, Seq[Rule]] =
    table(if (langs.isSingleton) langs.any else Any)

  // --- PhonemeBuilder (PhoneticEngine.cs): ordered, mutable ---
  private final class Builder(var phonemes: mutable.ArrayBuffer[Phoneme]) {
    def append(s: String): Unit = {
      var i = 0
      while (i < phonemes.length) {
        phonemes(i) = phonemes(i).copy(text = phonemes(i).text + s); i += 1
      }
    }
    /** cross-product with language restriction, capped at maxPhonemes. */
    def apply(expr: PhonemeExpr): Unit = {
      val out = mutable.ArrayBuffer.empty[Phoneme]
      var done = false
      for (left <- phonemes if !done; right <- expr.phonemes if !done) {
        val langs = left.langs.restrictTo(right.langs)
        if (!langs.isEmpty) {
          out += Phoneme(left.text + right.text, langs)
          if (out.length >= maxPhonemes) done = true
        }
      }
      phonemes = out
    }
    def makeString: String = phonemes.map(_.text).mkString("|")
  }
  private def emptyBuilder(langs: LangSet) =
    new Builder(mutable.ArrayBuffer(Phoneme("", langs)))

  /** RulesApplication.Invoke: first matching rule among those keyed by
    * the current char wins; returns the new position (advance by the
    * matched pattern length, else 1). */
  private def applyAt(rules: Map[String, Seq[Rule]], input: String,
                      b: Builder, i: Int): (Int, Boolean) = {
    rules.get(input.substring(i, i + 1)) match {
      case Some(rs) =>
        rs.find(_.patternAndContextMatches(input, i)) match {
          case Some(r) => b.apply(r.phoneme); (i + r.pattern.length, true)
          case None => (i + 1, false)
        }
      case None => (i + 1, false)
    }
  }

  /** ApplyFinalRules: per input phoneme, re-run the rules over its text
    * (unmatched chars APPENDED, unlike the main pass), union into a set
    * sorted by phoneme text (the COMPARER — so duplicates collapse and
    * the output '|' join is ordered). Same-text phonemes keep the FIRST
    * one's language set (plain UnionWith in the reference,
    * PhoneticEngine.cs:411 — the commons-codec 1.9 level the reference
    * ships; later codec versions merge the language sets instead). */
  private def applyFinalRules(b: Builder, finalRules: Map[String, Seq[Rule]]): Builder = {
    if (finalRules.isEmpty) return b
    val acc = mutable.SortedMap.empty[String, Phoneme]
    for (ph <- b.phonemes) {
      val sub = emptyBuilder(ph.langs)
      val text = ph.text
      var i = 0
      while (i < text.length) {
        val (ni, found) = applyAt(finalRules, text, sub, i)
        if (!found) sub.append(text.substring(i, i + 1))
        i = ni
      }
      for (p <- sub.phonemes if !acc.contains(p.text)) acc(p.text) = p
    }
    new Builder(mutable.ArrayBuffer.from(acc.values))
  }

  /** PhoneticEngine.Encode with a guessed language set. */
  def encode(input0: String): String = encode(input0, guessLanguages(input0))

  /** PhoneticEngine.Encode(input, languageSet) — restated exactly,
    * including the GENERIC d'/prefix double-encodes and the one-word
    * `words.First()` quirk. */
  def encode(input0: String, languageSet: LangSet): String = {
    val rules = rulesFor(mainRules, languageSet)
    val finalRules1 = finalCommon
    val finalRules2 = rulesFor(finalPerLang, languageSet)

    var input = input0.toLowerCase.replace('-', ' ').trim

    if (nameType == Generic) {
      if (input.length >= 2 && input.substring(0, 2) == "d'") {
        val remainder = input.substring(2)
        val combined = "d" + remainder
        return "(" + encode(remainder) + ")-(" + encode(combined) + ")"
      }
      for (l <- nameType.prefixes) {
        if (input.startsWith(l + " ")) {
          val remainder = input.substring(l.length + 1)
          val combined = l + remainder
          return "(" + encode(remainder) + ")-(" + encode(combined) + ")"
        }
      }
    }

    val words = input.split("\\s+").toSeq
    val words2: Seq[String] = nameType match {
      case Sephardic =>
        // crash parity: a word of only apostrophes makes split return an
        // empty array and .last throw — exactly the reference's
        // parts[parts.Length-1] IndexOutOfRange on the same input
        words.map(w => w.split("'").last).filterNot(nameType.prefixes.contains)
      case Ashkenazi => words.filterNot(nameType.prefixes.contains)
      case Generic => words
    }

    if (concat) {
      input = words2.mkString(" ")
    } else if (words2.length == 1) {
      input = words.head // the reference's quirk: words, not words2
    } else {
      return words2.map(encode(_)).mkString("-")
    }

    var b = emptyBuilder(languageSet)
    var i = 0
    while (i < input.length) {
      val (ni, _) = applyAt(rules, input, b, i) // main pass DROPS unmatched
      i = ni
    }
    b = applyFinalRules(b, finalRules1)
    b = applyFinalRules(b, finalRules2)
    b.makeString
  }

  /** BeiderMorseFilter.cs token surface: the `[^()|-]+` alternatives of
    * the encoded form — first at the original position, the rest stacked
    * at posIncr 0 by the caller. An encode with no alternatives keeps
    * the original term (the filter leaves termAtt untouched). */
  def encodeTokens(term: String): Seq[String] = {
    val m = Pattern.compile("[^()|-]+").matcher(encode(term))
    val out = mutable.ArrayBuffer.empty[String]
    while (m.find()) out += m.group()
    if (out.isEmpty) Seq(term) else out.toSeq
  }
}
