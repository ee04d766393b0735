package graft.analysis

import scala.collection.mutable.ArrayBuffer

/** Chinese HHMM word segmenter: the reference's SmartChineseAnalyzer core
  * restated over a user-supplied (word-frequency, bigram-frequency) model
  * (reference: /root/reference/src/Lucene.Net.Analysis.SmartCn/HHMM/ —
  * the shipped coredict.mem/bigramdict.mem are trained corpus
  * derivatives we neither read nor embed; as with Kuromoji and Hunspell,
  * the algorithm over user data IS the contract).
  *
  * Faithfully restated, with the reference line cited at each site:
  *
  *  - SegGraph construction (HHMMSegmenter.cs:38-230): every single
  *    hanzi becomes a token whether or not it is in the dictionary;
  *    multi-char dictionary words are added by prefix extension;
  *    letter/digit runs (half- or full-width, mixed) collapse to one
  *    token whose MODEL ID is the reference's placeholder word 未##串 /
  *    未##数 (frequency looked up under the placeholder, surface kept
  *    for output); punctuation gets frequency MAX_FREQUENCE; sentence
  *    markers 始##始 (-1,0) and 末##末 (len,len+1) close the graph.
  *  - Bigram graph (BiSegGraph.cs:40-125): an edge for every (t1, t2)
  *    with t2 in the FIRST existing start position >= t1.end (space-like
  *    chars create gaps, :78-88), weighted
  *    -log( smooth*(1+f1)/MAX + (1-smooth)*((1-tiny)*b12/(1+f1) + tiny) )
  *    with smooth = 0.1, tiny = 1/MAX, MAX = 2159997 (Utility.cs:49 —
  *    2079997 + 80000), f1 = t1's word frequency, b12 = the bigram
  *    frequency of "t1@t2" under the MODEL ids.
  *  - Shortest path (BiSegGraph.cs:185-220): min-sum Viterbi from the
  *    start marker to the end marker (PathNode weight comparison keeps
  *    the earlier predecessor on ties); markers are dropped from output.
  *  - SegTokenFilter.cs:39-74: full-width chars fold to half-width
  *    (cp - 0xFEE0 for >= 0xFF10), A-Z lowercase (+0x20), every
  *    delimiter token's text becomes "," (COMMON_DELIMITER).
  *
  * Char classes follow Utility.GetCharType (Utility.cs:171-196)
  * verbatim, including its exact block boundaries (HANZI = U+4E00-9FA5).
  */
object SmartCn {
  val MaxFrequence: Int = 2079997 + 80000
  val StringId = "未##串"
  val NumberId = "未##数"
  val StartId = "始##始"
  val EndId = "末##末"

  sealed trait CharKind
  case object Hanzi extends CharKind
  case object Letter extends CharKind
  case object Digit extends CharKind
  case object FwLetter extends CharKind
  case object FwDigit extends CharKind
  case object SpaceLike extends CharKind
  case object Delimiter extends CharKind
  case object Other extends CharKind

  def charType(ch: Char): CharKind =
    if (ch >= 0x4E00 && ch <= 0x9FA5) Hanzi
    else if ((ch >= 'A' && ch <= 'Z') || (ch >= 'a' && ch <= 'z')) Letter
    else if (ch >= '0' && ch <= '9') Digit
    else if (ch == ' ' || ch == '\t' || ch == '\r' || ch == '\n' || ch == '　') SpaceLike
    else if ((ch >= 0x0021 && ch <= 0x00BB) || (ch >= 0x2010 && ch <= 0x2642)
      || (ch >= 0x3001 && ch <= 0x301E)) Delimiter
    else if ((ch >= 0xFF21 && ch <= 0xFF3A) || (ch >= 0xFF41 && ch <= 0xFF5A)) FwLetter
    else if (ch >= 0xFF10 && ch <= 0xFF19) FwDigit
    else if (ch >= 0xFE30 && ch <= 0xFF63) Delimiter
    else Other

  sealed trait WordKind
  case object ChineseWord extends WordKind
  case object StringWord extends WordKind
  case object NumberWord extends WordKind
  case object DelimiterWord extends WordKind
  case object Marker extends WordKind

  /** A lattice token: `id` is the model word (placeholder for
    * letter/number runs), `surface` the original text span. */
  final case class SegToken(id: String, surface: String, start: Int,
                            end: Int, kind: WordKind, freq: Int)
}

final class SmartCn(wordFreq: Map[String, Int],
                    bigramFreq: Map[(String, String), Int] = Map.empty)
    extends Serializable {
  import SmartCn._

  private def freq(id: String): Int = wordFreq.getOrElse(id, 0)
  private val maxWordLen =
    (1 +: wordFreq.keys.filter(_.forall(c => charType(c) == Hanzi))
      .map(_.length).toSeq).max

  /** HHMMSegmenter.CreateSegGraph restated (:38-230). */
  private[analysis] def segGraph(s: String): Seq[SegToken] = {
    val out = ArrayBuffer.empty[SegToken]
    var i = 0
    while (i < s.length) {
      charType(s.charAt(i)) match {
        case SpaceLike => i += 1
        case Hanzi =>
          out += SegToken(s.substring(i, i + 1), s.substring(i, i + 1),
            i, i + 1, ChineseWord, freq(s.substring(i, i + 1)))
          // prefix extension over the dictionary (:74-107); space-like
          // chars inside a candidate are skipped by the reference's
          // inner loop — rare enough that we restrict to contiguous runs
          var j = i + 2
          while (j <= s.length && j - i <= maxWordLen) {
            val w = s.substring(i, j)
            if (w.forall(c => charType(c) == Hanzi) && wordFreq.contains(w))
              out += SegToken(w, w, i, j, ChineseWord, freq(w))
            j += 1
          }
          i += 1
        case Letter | FwLetter =>
          var j = i
          while (j < s.length &&
                 (charType(s.charAt(j)) == Letter || charType(s.charAt(j)) == FwLetter)) j += 1
          out += SegToken(StringId, s.substring(i, j), i, j, StringWord,
            freq(StringId))
          i = j
        case Digit | FwDigit =>
          var j = i
          while (j < s.length &&
                 (charType(s.charAt(j)) == Digit || charType(s.charAt(j)) == FwDigit)) j += 1
          out += SegToken(NumberId, s.substring(i, j), i, j, NumberWord,
            freq(NumberId))
          i = j
        case Delimiter =>
          out += SegToken(s.substring(i, i + 1), s.substring(i, i + 1),
            i, i + 1, DelimiterWord, MaxFrequence)
          i += 1
        case Other =>
          out += SegToken(StringId, s.substring(i, i + 1), i, i + 1,
            StringWord, freq(StringId))
          i += 1
      }
    }
    out += SegToken(StartId, "", -1, 0, Marker, freq(StartId))
    out += SegToken(EndId, "", s.length, s.length + 1, Marker, freq(EndId))
    out.toSeq
  }

  /** BiSegGraph edge weight (BiSegGraph.cs:105-113). */
  def edgeWeight(t1: SegToken, t2: SegToken): Double = {
    val smooth = 0.1
    val tiny = 1.0 / MaxFrequence
    val b12 = bigramFreq.getOrElse((t1.id, t2.id), 0).toDouble
    -math.log(smooth * (1.0 + t1.freq) / MaxFrequence +
      (1.0 - smooth) * ((1.0 - tiny) * b12 / (1.0 + t1.freq) + tiny))
  }

  /** Segment one string: bigram-graph Viterbi, markers dropped, raw
    * lattice tokens returned (surface text unfiltered). */
  def segment(s: String): Array[SegToken] = {
    val toks = segGraph(s)
    val starts = toks.map(_.start).distinct.sorted
    val byStart = toks.groupBy(_.start)
    // successor start = first EXISTING start >= t.end (:78-88)
    def succStart(e: Int): Option[Int] = starts.find(_ >= e)
    val n = toks.length
    val idx = toks.zipWithIndex.toMap
    val dist = Array.fill(n)(Double.MaxValue)
    val back = Array.fill(n)(-1)
    val startTok = toks.find(_.id == StartId).get
    dist(idx(startTok)) = 0.0
    // relax in start order (the graph is a DAG ordered by start)
    for (t1 <- toks.sortBy(_.start) if dist(idx(t1)) < Double.MaxValue;
         if t1.id != EndId;
         ns <- succStart(t1.end).toSeq;
         t2 <- byStart.getOrElse(ns, Seq.empty)) {
      val d = dist(idx(t1)) + edgeWeight(t1, t2)
      if (d < dist(idx(t2))) { dist(idx(t2)) = d; back(idx(t2)) = idx(t1) }
    }
    val endTok = toks.find(_.id == EndId).get
    require(dist(idx(endTok)) < Double.MaxValue, s"no path: $s")
    val path = ArrayBuffer.empty[SegToken]
    var cur = idx(endTok)
    while (cur != -1) { path += toks(cur); cur = back(cur) }
    path.reverse.filter(_.kind != Marker).toArray
  }

  /** SegTokenFilter.cs:39-74 normalization. */
  def filter(t: SegToken): SegToken = t.kind match {
    case StringWord | NumberWord =>
      t.copy(surface = t.surface.map { c =>
        val h = if (c >= 0xFF10) (c - 0xFEE0).toChar else c
        if (h >= 'A' && h <= 'Z') (h + 0x20).toChar else h
      })
    case DelimiterWord => t.copy(surface = ",")
    case _ => t
  }

  /** Full chain: segment + normalize, standard [[Token]] output. */
  def analyze(s: String): Array[Token] =
    segment(s).map(filter).zipWithIndex.map { case (t, i) =>
      Token(t.surface, i, t.start, t.end)
    }

  /** SentenceTokenizer.cs:63-125 restated index-based: a sentence ends
    * at (and includes) one of 。，！？；,!?; or at TWO consecutive
    * space-likes (the first space stays in the sentence text, the second
    * is consumed into the offset only); leading space-likes are skipped.
    * Returns (text, startOff, endOff). */
  def sentences(s: String): Seq[(String, Int, Int)] = {
    val spaces = " 　\t\r\n"
    val punct = "。，！？；,!?;"
    val out = ArrayBuffer.empty[(String, Int, Int)]
    var i = 0 // read cursor
    var tokenStart = 0
    var tokenEnd = 0
    var more = true
    while (more) {
      val buf = new StringBuilder
      var atBegin = true
      tokenStart = tokenEnd
      var ci = if (i < s.length) s.charAt(i).toInt else -1
      i += 1
      var looping = true
      while (looping) {
        if (ci == -1) looping = false
        else if (punct.indexOf(ci) >= 0) {
          buf.append(ci.toChar); tokenEnd += 1; looping = false
        } else if (atBegin && spaces.indexOf(ci) >= 0) {
          tokenStart += 1; tokenEnd += 1
          ci = if (i < s.length) s.charAt(i).toInt else -1
          i += 1
        } else {
          buf.append(ci.toChar); atBegin = false; tokenEnd += 1
          val pch = ci
          ci = if (i < s.length) s.charAt(i).toInt else -1
          i += 1
          if (ci != -1 && spaces.indexOf(ci) >= 0 && spaces.indexOf(pch) >= 0) {
            tokenEnd += 1; looping = false
          }
        }
      }
      if (buf.isEmpty) more = false
      else out += ((buf.toString, tokenStart, tokenEnd))
    }
    out.toSeq
  }

  /** The HMMChineseTokenizer / SmartChineseAnalyzer pipeline: sentence
    * split, then per-sentence HHMM segmentation + SegTokenFilter, global
    * offsets and running positions (HMMChineseTokenizer.cs:36-49). */
  def analyzeSentences(s: String): Array[Token] = {
    var pos = -1
    sentences(s).iterator.flatMap { case (text, start, _) =>
      segment(text).iterator.map(filter).map { t =>
        pos += 1
        Token(t.surface, pos, t.start + start, t.end + start)
      }
    }.toArray
  }
}
