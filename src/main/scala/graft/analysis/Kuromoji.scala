package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Japanese morphological tokenizer: least-cost lattice Viterbi over a
  * user-supplied MeCab-style lexicon, restating the reference's
  * JapaneseTokenizer (reference:
  * /root/reference/src/Lucene.Net.Analysis.Kuromoji/JapaneseTokenizer.cs).
  *
  * The reference ships trained IPADIC binary tables
  * (Dict/TokenInfoDictionary$*.dat, ConnectionCosts.dat,
  * CharacterDefinition.dat — proprietary-licensed corpus derivatives we
  * neither read nor embed); like the Hunspell module, the ALGORITHM over a
  * user-supplied dictionary is the contract here:
  *
  *  - Lattice construction (JapaneseTokenizer.cs:610-712): at every
  *    character position, every dictionary entry whose surface form is a
  *    prefix of the remaining input adds a KNOWN arc; when no entry
  *    matches, or the character's class is marked `invoke`, an UNKNOWN
  *    arc is added spanning 1 char — or the whole run of same-class,
  *    same-punctuation-ness characters when the class is marked `group`
  *    (:670-696, "copied from UnknownDictionary.lookup"), capped at
  *    MAX_UNKNOWN_WORD_LENGTH=1024 (:79). In NORMAL mode a position
  *    already inside a previously-emitted unknown word adds no second
  *    unknown arc (:653-658, `!searchMode && unknownWordEndIndex > pos`).
  *  - Viterbi (:716-780 Add/:788-905 Backtrace): cost of an arc ending a
  *    path = best over predecessor arcs of (predCost +
  *    connectionCost(pred.rightId, arc.leftId)) + arc.wordCost; BOS and
  *    EOS carry id 0 on their open side. Ties keep the earlier-added arc
  *    (reference `<` comparison — first minimum wins).
  *  - SEARCH mode (:282-307 ComputePenalty): an arc of length > 2 whose
  *    characters are all Kanji pays (len-2)*3000; any other arc of
  *    length > 7 pays (len-7)*1700. The penalty biases the lattice
  *    toward decompositions of long compounds.
  *  - SEARCH-mode compound output (:926-1010): when the best path still
  *    picked a penalized token, the reference prunes that token from the
  *    graph, re-scores, and — if the second-best segmentation of the
  *    same span costs no more than bestCost + penalty (threshold =
  *    ComputeSecondBestThreshold = the penalty, :274-280) — emits BOTH:
  *    the decomposition as ordinary tokens and the compound stacked at
  *    the first sub-token's position with posLength = #sub-tokens.
  *    Restated here non-incrementally: the alternative is the best path
  *    over the compound's span with all penalized full-span arcs
  *    removed, boundary connection ids taken from the adjacent best-path
  *    tokens — the same acceptance test evaluated on a whole-string
  *    lattice instead of the reference's rolling buffer (a memory
  *    optimization, not a semantic one).
  *  - EXTENDED mode (:1105-1130): like SEARCH (penalties active, no
  *    compounds) but UNKNOWN tokens are re-emitted as single-character
  *    unigrams.
  *  - discardPunctuation (:1132-1150): punctuation tokens are dropped
  *    from the output (positions still advance — same contract as the
  *    stop filter).
  *
  * Character classes are parameters with Unicode-block defaults
  * (KANJI/KATAKANA/HIRAGANA/ALPHA/NUMERIC/DEFAULT) replacing the
  * reference's trained char.def; `group`/`invoke` flags follow the
  * published IPADIC char.def conventions (KATAKANA/ALPHA/NUMERIC group).
  */
object Kuromoji {

  /** One lexicon row: MeCab (surface, leftId, rightId, wordCost) plus the
    * token attributes the reference's filters consume (reference:
    * Dict/TokenInfoDictionary.cs — POS, base form, reading). */
  final case class JaEntry(surface: String, leftId: Int, rightId: Int,
                           cost: Int, partOfSpeech: String = "",
                           baseForm: String = "", reading: String = "")

  /** Unknown-word class definition (reference: Dict/CharacterDefinition.cs
    * + Dict/UnknownDictionary.cs): `invoke` forces an unknown arc even
    * when dictionary entries match; `group` extends the unknown arc over
    * the whole same-class run. */
  final case class JaCharClass(name: String, invoke: Boolean, group: Boolean,
                               leftId: Int, rightId: Int, cost: Int)

  val DefaultClasses: Seq[JaCharClass] = Seq(
    JaCharClass("KANJI",    invoke = false, group = false, 10, 10, 15000),
    JaCharClass("KATAKANA", invoke = true,  group = true,  11, 11, 9000),
    JaCharClass("HIRAGANA", invoke = false, group = false, 12, 12, 9000),
    JaCharClass("ALPHA",    invoke = true,  group = true,  13, 13, 11000),
    JaCharClass("NUMERIC",  invoke = true,  group = true,  14, 14, 11000),
    JaCharClass("DEFAULT",  invoke = true,  group = false, 15, 15, 12000))

  def classNameOf(c: Char): String =
    if (c >= 0x4E00 && c <= 0x9FFF) "KANJI"
    else if (c >= 0x30A0 && c <= 0x30FF) "KATAKANA"
    else if (c >= 0x3040 && c <= 0x309F) "HIRAGANA"
    else if (Character.isLetter(c)) "ALPHA"
    else if (Character.isDigit(c)) "NUMERIC"
    else "DEFAULT"

  def isKanji(c: Char): Boolean = classNameOf(c) == "KANJI"
  private def isPunct(c: Char): Boolean = {
    val t = Character.getType(c)
    t == Character.SPACE_SEPARATOR || t == Character.LINE_SEPARATOR ||
    t == Character.PARAGRAPH_SEPARATOR || t == Character.CONTROL ||
    t == Character.FORMAT || t == Character.DASH_PUNCTUATION ||
    t == Character.START_PUNCTUATION || t == Character.END_PUNCTUATION ||
    t == Character.CONNECTOR_PUNCTUATION || t == Character.OTHER_PUNCTUATION ||
    t == Character.MATH_SYMBOL || t == Character.CURRENCY_SYMBOL ||
    t == Character.MODIFIER_SYMBOL || t == Character.OTHER_SYMBOL ||
    t == Character.INITIAL_QUOTE_PUNCTUATION || t == Character.FINAL_QUOTE_PUNCTUATION
  }

  sealed trait Mode
  case object Normal extends Mode
  case object Search extends Mode   // penalties + compound output
  case object Extended extends Mode // penalties + unknown unigrams

  /** Output token: surface (or unigram) + char offsets + position
    * increment/length (compounds stack at posIncr 0 with posLength =
    * #sub-tokens, the reference's Token.PositionLength contract) + the
    * attributes JapaneseBaseFormFilter / PartOfSpeechStopFilter /
    * KatakanaStemFilter consume. */
  final case class JaToken(term: String, startOff: Int, endOff: Int,
                           posIncr: Int, posLength: Int, known: Boolean,
                           partOfSpeech: String = "", baseForm: String = "",
                           reading: String = "")

  private val MaxUnknownLen = 1024
  private val KanjiLen = 2
  private val OtherLen = 7
  private val KanjiPenalty = 3000
  private val OtherPenalty = 1700

  /** A user-dictionary row (reference: Dict/UserDictionary.cs — the CSV
    * "text,segmentation,readings,POS" format): `text` matches in the
    * lattice as one arc at WORD_COST=-100000 with LEFT_ID=RIGHT_ID=5
    * (:47-51), and on the best path emits one token PER SEGMENT with the
    * per-segment reading and the entry's POS. */
  final case class JaUserEntry(text: String, segments: Seq[String],
                               readings: Seq[String] = Nil, pos: String = "") {
    require(segments.mkString == text,
      s"segments ${segments.mkString("+")} do not spell '$text'")
    require(readings.isEmpty || readings.length == segments.length,
      "one reading per segment")
  }
  private val UserWordCost = -100000
  private val UserId = 5

  /** One lattice arc: [start, end) + ids/cost (+ entry when KNOWN,
    * user row when USER). */
  private final case class Arc(start: Int, end: Int, leftId: Int,
                               rightId: Int, cost: Int,
                               entry: JaEntry, penalty: Int,
                               user: JaUserEntry = null)
}

final class Kuromoji(entries: Seq[Kuromoji.JaEntry],
                     connCosts: Map[(Int, Int), Int] = Map.empty,
                     mode: Kuromoji.Mode = Kuromoji.Normal,
                     discardPunctuation: Boolean = true,
                     classes: Seq[Kuromoji.JaCharClass] = Kuromoji.DefaultClasses,
                     userDict: Seq[Kuromoji.JaUserEntry] = Nil)
    extends Serializable {
  import Kuromoji._

  private val byFirst: Map[Char, Seq[JaEntry]] =
    entries.filter(_.surface.nonEmpty).groupBy(_.surface.head)
      .map { case (c, es) => c -> es.sortBy(e => (e.surface.length, e.cost)) }
  private val userByFirst: Map[Char, Seq[JaUserEntry]] =
    userDict.filter(_.text.nonEmpty).groupBy(_.text.head)
  private val classByName: Map[String, JaCharClass] =
    classes.map(c => c.name -> c).toMap
  private def conn(r: Int, l: Int): Int = connCosts.getOrElse((r, l), 0)
  private val searchMode = mode != Normal

  private def penalty(s: String, start: Int, end: Int): Int = {
    val len = end - start
    if (!searchMode || len <= KanjiLen) 0
    else if ((start until end).forall(i => isKanji(s.charAt(i))))
      (len - KanjiLen) * KanjiPenalty
    else if (len > OtherLen) (len - OtherLen) * OtherPenalty
    else 0
  }

  /** Build every lattice arc for `s` (JapaneseTokenizer.cs:610-712). */
  private def arcs(s: String): IndexedSeq[Arc] = {
    val out = ArrayBuffer.empty[Arc]
    var unknownWordEnd = -1
    var pos = 0
    while (pos < s.length) {
      var anyMatches = false
      // USER arcs first (JapaneseTokenizer.cs:612-637): WORD_COST
      // -100000 guarantees the user segmentation wins
      for (u <- userByFirst.getOrElse(s.charAt(pos), Nil)
           if s.startsWith(u.text, pos)) {
        val end = pos + u.text.length
        out += Arc(pos, end, UserId, UserId, UserWordCost, null,
          penalty(s, pos, end), user = u)
        anyMatches = true
      }
      for (e <- byFirst.getOrElse(s.charAt(pos), Nil)
           if s.startsWith(e.surface, pos)) {
        val end = pos + e.surface.length
        out += Arc(pos, end, e.leftId, e.rightId, e.cost, e,
          penalty(s, pos, end))
        anyMatches = true
      }
      // NORMAL mode does not re-invoke unknown processing inside a
      // previously found unknown word (:653-658)
      val skipUnknown = mode == Normal && unknownWordEnd > pos
      if (!skipUnknown) {
        val c = s.charAt(pos)
        val cls = classByName(classNameOf(c))
        if (!anyMatches || cls.invoke) {
          val punct = isPunct(c)
          var len = 1
          if (cls.group) {
            while (pos + len < s.length && len < MaxUnknownLen &&
                   classNameOf(s.charAt(pos + len)) == cls.name &&
                   isPunct(s.charAt(pos + len)) == punct) len += 1
          }
          val end = pos + len
          out += Arc(pos, end, cls.leftId, cls.rightId, cls.cost, null,
            penalty(s, pos, end))
          unknownWordEnd = end
        }
      }
      pos += 1
    }
    out.toIndexedSeq
  }

  /** Least-cost path over a span given boundary connection ids; returns
    * the arc sequence, or null when the span is not coverable. `banned`
    * removes arcs (the compound-pruning re-score). */
  private def viterbi(all: IndexedSeq[Arc], start: Int, end: Int,
                      bosRight: Int, eosLeft: Int,
                      banned: Arc => Boolean): (Array[Arc], Int) = {
    val span = all.filter(a => a.start >= start && a.end <= end && !banned(a))
    val byStart = span.groupBy(_.start)
    val byEnd = span.groupBy(_.end)
    // per-arc best arrival cost (cost to the arc's END, inclusive of it)
    val best = new java.util.HashMap[Arc, Int]()
    val back = new java.util.HashMap[Arc, Arc]()
    var p = start
    while (p < end) {
      for (a <- byStart.getOrElse(p, Seq.empty)) {
        val base =
          if (p == start) Some(conn(bosRight, a.leftId))
          else {
            val preds = byEnd.getOrElse(p, Seq.empty).filter(best.containsKey)
            if (preds.isEmpty) None
            else {
              var bc = Int.MaxValue; var bp: Arc = null
              for (x <- preds) {
                val c = best.get(x) + conn(x.rightId, a.leftId)
                if (c < bc) { bc = c; bp = x }
              }
              back.put(a, bp); Some(bc)
            }
          }
        base.foreach(b => best.put(a, b + a.cost + a.penalty))
      }
      p += 1
    }
    var bc = Int.MaxValue; var ba: Arc = null
    best.forEach { (a, c) =>
      if (a.end == end) {
        val t = c + conn(a.rightId, eosLeft)
        if (t < bc) { bc = t; ba = a }
      }
    }
    if (ba == null) (null, Int.MaxValue)
    else {
      val path = ArrayBuffer.empty[Arc]
      var cur = ba
      while (cur != null) { path += cur; cur = back.get(cur) }
      (path.reverse.toArray, bc)
    }
  }

  private def toToken(s: String, a: Arc, posIncr: Int, posLength: Int): JaToken =
    if (a.entry != null)
      JaToken(a.entry.surface, a.start, a.end, posIncr, posLength,
        known = true, a.entry.partOfSpeech, a.entry.baseForm, a.entry.reading)
    else
      JaToken(s.substring(a.start, a.end), a.start, a.end, posIncr, posLength,
        known = false)

  /** Tokenize one string. Offsets are char offsets into `s`. */
  def tokenize(s: String): Array[JaToken] = {
    if (s.isEmpty) return Array.empty
    val all0 = arcs(s)
    var (path, _) = viterbi(all0, 0, s.length, 0, 0, _ => false)
    val all = if (path != null) all0 else {
      // a KNOWN arc ended inside an unknown-word run whose interior adds
      // no NORMAL-mode arcs — stitch coverage with per-char DEFAULT arcs
      // (the reference's rolling lattice only advances through positions
      // with arrivals, an equivalent recovery)
      val d = classByName("DEFAULT")
      val extra = (0 until s.length).map(p =>
        Arc(p, p + 1, d.leftId, d.rightId, d.cost, null, 0))
      val a2 = all0 ++ extra
      path = viterbi(a2, 0, s.length, 0, 0, _ => false)._1
      a2
    }
    require(path != null, s"lattice not coverable: $s")
    val out = ArrayBuffer.empty[JaToken]
    var i = 0
    while (i < path.length) {
      val a = path(i)
      val emitted: Seq[JaToken] =
        if (a.user != null) {
          // USER arc: one token per dictionary segment
          // (JapaneseTokenizer.cs:1060-1093; never compound-expanded,
          // :928 `backType != USER`)
          var off = a.start
          a.user.segments.zipWithIndex.map { case (seg, k) =>
            val t = JaToken(seg, off, off + seg.length, 1, 1, known = true,
              a.user.pos,
              reading = if (a.user.readings.nonEmpty) a.user.readings(k) else "")
            off += seg.length
            t
          }
        }
        else if (mode == Search && a.penalty > 0) secondBest(s, all, path, i)
        else if (mode == Extended && a.entry == null)
          // EXTENDED: unknown word -> unigrams (:1105-1130)
          (a.start until a.end).map(p =>
            JaToken(s.substring(p, p + 1), p, p + 1, 1, 1, known = false))
        else Seq(toToken(s, a, 1, 1))
      out ++= emitted
      i += 1
    }
    val kept = if (!discardPunctuation) out.toArray
      else out.filter(t => !t.term.forall(isPunct)).toArray
    kept
  }

  /** SEARCH-mode compound handling for best-path arc `path(i)` with
    * penalty > 0 (JapaneseTokenizer.cs:926-1010): try the best
    * alternative segmentation of the same span with full-span penalized
    * arcs pruned; accept when altCost <= spanBestCost + penalty. */
  private def secondBest(s: String, all: IndexedSeq[Arc],
                         path: Array[Arc], i: Int): Seq[JaToken] = {
    val a = path(i)
    val bosRight = if (i == 0) 0 else path(i - 1).rightId
    val eosLeft = if (i == path.length - 1) 0 else path(i + 1).leftId
    val selfCost = conn(bosRight, a.leftId) + a.cost + a.penalty +
      conn(a.rightId, eosLeft)
    val (alt, altCost) = viterbi(all, a.start, a.end, bosRight, eosLeft,
      x => x.start == a.start && x.end == a.end && x.penalty > 0)
    // threshold = bestCost + penalty, where bestCost already carries the
    // penalty once (the lattice arc cost included it, :347-355; the
    // threshold adds it AGAIN, :946-951)
    if (alt == null || altCost > selfCost + a.penalty)
      return Seq(toToken(s, a, 1, 1))
    // emit: first sub-token, compound stacked at the same position
    // (posIncr 0, posLength = #subs), remaining sub-tokens
    val subs = alt.map(toToken(s, _, 1, 1))
    Seq(subs.head, toToken(s, a, 0, subs.length)) ++ subs.tail
  }

  /** GraphvizFormatter analog (reference: GraphvizFormatter.cs:49-183):
    * the lattice as DOT, rankdir LR, one node per character position,
    * every arc an edge labeled "surface cost(+penalty)", the best path
    * in the reference's green (#40e050, penwidth 3), BOS/EOS framing
    * edges. A debugging formatter like the SimpleText codec — feed it to
    * `dot -Tpng` to see why a segmentation won. */
  def toDot(s: String): String = {
    val all = arcs(s)
    val (path, _) = viterbi(all, 0, s.length, 0, 0, _ => false)
    val onPath: Set[(Int, Int, String)] =
      if (path == null) Set.empty
      else path.map(a => (a.start, a.end,
        if (a.entry != null) a.entry.surface
        else if (a.user != null) a.user.text else "UNK")).toSet
    val sb = new StringBuilder
    sb.append("digraph viterbi {\n")
    sb.append("  graph [ fontsize=30 labelloc=\"t\" label=\"\" " +
      "splines=true overlap=false rankdir = \"LR\"];\n")
    sb.append("  edge [ fontcolor=\"red\" color=\"#606060\" ]\n")
    sb.append("  node [ style=\"filled\" fillcolor=\"#e8e8f0\" " +
      "shape=\"Mrecord\" ]\n")
    sb.append("  init -> 0 [label=\"BOS\"]\n")
    for (a <- all) {
      val surface = if (a.entry != null) a.entry.surface
        else if (a.user != null) a.user.text else "UNK"
      val label = s"$surface ${a.cost}" +
        (if (a.penalty > 0) s"+${a.penalty}" else "")
      val attrs =
        if (onPath((a.start, a.end, surface)))
          " color=\"#40e050\" fontcolor=\"#40a050\" penwidth=3 fontsize=20"
        else ""
      sb.append(s"""  ${a.start} -> ${a.end} [label="$label"$attrs]\n""")
    }
    sb.append(s"  ${s.length} -> fini [label=\"EOS\"]\n")
    sb.append("}\n")
    sb.toString
  }

  /** The standard analyzer-chain adapter: absolute positions from the
    * posIncr stream (stacked compounds share their first sub-token's
    * position), graft [[Token]] output. */
  def analyze(s: String): Array[Token] = {
    var pos = -1
    tokenize(s).map { t =>
      pos += t.posIncr
      Token(t.term, pos, t.startOff, t.endOff)
    }
  }
}

/** The reference's Japanese token filters over [[Kuromoji.JaToken]]
  * streams. */
object JapaneseFilters {
  import Kuromoji.JaToken

  /** JapaneseBaseFormFilter.cs:43-55 — replace the term with its
    * dictionary base form when present (inflected verbs/adjectives). */
  def baseForm(ts: Array[JaToken]): Array[JaToken] =
    ts.map(t => if (t.baseForm.nonEmpty) t.copy(term = t.baseForm) else t)

  /** JapanesePartOfSpeechStopFilter.cs:47-51 — drop tokens whose POS tag
    * is in the stop set (position increments accumulate onto the next
    * kept token, FilteringTokenFilter contract). */
  def posStop(ts: Array[JaToken], stopTags: Set[String]): Array[JaToken] = {
    val out = ArrayBuffer.empty[JaToken]
    var gap = 0
    for (t <- ts) {
      if (t.partOfSpeech.nonEmpty && stopTags.contains(t.partOfSpeech)) gap += t.posIncr
      else { out += t.copy(posIncr = t.posIncr + gap); gap = 0 }
    }
    out.toArray
  }

  /** JapaneseKatakanaStemFilter.cs:51-77 — strip one trailing prolonged
    * sound mark (U+30FC) from katakana terms of length >= min (default
    * 4). */
  def katakanaStem(ts: Array[JaToken], min: Int = 4): Array[JaToken] =
    ts.map { t =>
      val w = t.term
      if (w.length >= min && w.last == 'ー' &&
          w.forall(c => (c >= 0x30A0 && c <= 0x30FF)))
        t.copy(term = w.dropRight(1))
      else t
    }
}
