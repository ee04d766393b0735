package graft.analysis

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Multi-word synonym engine: the reference's SynonymFilter + SynonymMap
  * + SolrSynonymParser restated over whole token arrays (reference:
  * /root/reference/src/Lucene.Net.Analysis.Common/Analysis/Synonym/ —
  * SynonymFilter.cs, SynonymMap.cs, SolrSynonymParser.cs).
  *
  * Faithful behaviors, each cited at its site:
  *  - Greedy parsing (SynonymFilter.cs:34-47): the rule starting
  *    earliest and matching the most input tokens wins; parsing never
  *    restarts inside a consumed match (inputSkipCount, :481).
  *  - Output stacking (:500-553): for a match of N input tokens, each
  *    output's word j lands on input slot (start + j) — words past the
  *    match overlap the FOLLOWING input tokens (the documented
  *    "sausage" flattening of the real graph). A single-word output
  *    carries endOffset = the match's last input endOffset and
  *    posLength = keepOrig ? N : 1; each word of a multi-word output
  *    carries posLength 1 and inherits the overlapped input token's
  *    endOffset (:526-543).
  *  - keepOrig (SynonymMap.cs:97, code & 0x1): the original tokens of a
  *    matched span are kept (stacked under the outputs) or dropped,
  *    per input key; matched spans OR the flag (:555-560).
  *  - Position flow: the filter runs BEFORE stop filtering (:30-32 "you
  *    should place this filter before filtering out stop words"), so
  *    increments are 1 and positions here are reassigned sequentially;
  *    at one position the original (when kept) emits first, outputs
  *    follow at posIncr 0.
  */
object Synonyms {

  /** One input key's entry: every output (as word sequences) + keepOrig. */
  final case class SynEntry(outputs: Seq[Seq[String]], keepOrig: Boolean)

  /** SynonymMap.Builder analog: input word-seq → outputs. */
  final class SynonymMap private[Synonyms] (
      val rules: Map[Seq[String], SynEntry]) extends Serializable {
    private[Synonyms] val byFirst: Map[String, Seq[Seq[String]]] =
      rules.keys.toSeq.groupBy(_.head)
        .map { case (w, ks) => w -> ks.sortBy(-_.length) } // longest first
  }

  final class Builder {
    private val acc =
      mutable.LinkedHashMap.empty[Seq[String], (ArrayBuffer[Seq[String]], Boolean)]
    /** SynonymMap.Builder.Add (SynonymMap.cs:162-208). */
    def add(input: Seq[String], output: Seq[String], includeOrig: Boolean): this.type = {
      require(input.nonEmpty && output.nonEmpty && output.forall(_.nonEmpty))
      val (outs, keep) = acc.getOrElseUpdate(input, (ArrayBuffer.empty, false))
      if (!outs.contains(output)) outs += output
      acc(input) = (outs, keep || includeOrig)
      this
    }
    def build(): SynonymMap =
      new SynonymMap(acc.map { case (in, (outs, keep)) =>
        in -> SynEntry(outs.toSeq, keep) }.toMap)
  }

  /** SolrSynonymParser (Analysis/Synonym/SolrSynonymParser.cs): one rule
    * per line; `a, b => x, y` maps every LHS alternative (multi-word
    * alternatives split on whitespace) to every RHS, originals dropped;
    * `a, b, c` is an equivalence class — expand=true maps every member
    * to every member (:49-55), expand=false maps every member to the
    * first. '#' comments and blank lines skipped. */
  def parseSolr(text: String, expand: Boolean = true,
                analyze: String => Seq[String] = _.toLowerCase.split("\\s+").toSeq): SynonymMap = {
    val b = new Builder
    for (line0 <- text.linesIterator; line = line0.trim
         if line.nonEmpty && !line.startsWith("#")) {
      def words(s: String): Seq[Seq[String]] =
        s.split(",").toSeq.map(_.trim).filter(_.nonEmpty).map(analyze)
      if (line.contains("=>")) {
        val Array(lhs, rhs) = line.split("=>", 2)
        for (in <- words(lhs); out <- words(rhs)) b.add(in, out, includeOrig = false)
      } else {
        val members = words(line)
        if (expand)
          for (in <- members; out <- members) b.add(in, out, includeOrig = false)
        else
          for (in <- members) b.add(in, members.head, includeOrig = false)
      }
    }
    b.build()
  }

  /** WordnetSynonymParser (Analysis/Synonym/WordnetSynonymParser.cs):
    * prolog lines `s(100001740,1,'entity',n,1,11).` — words grouped by
    * synset id form equivalence classes with the same expand semantics
    * as the Solr format; `''` escapes a quote; multi-word entries split
    * on whitespace. */
  def parseWordnet(text: String, expand: Boolean = true,
                   analyze: String => Seq[String] = _.toLowerCase.split("\\s+").toSeq): SynonymMap = {
    val Line = """s\(\s*(\d+)\s*,\s*\d+\s*,\s*'(.*)'\s*,.*\)\s*\.?\s*""".r
    val synsets = mutable.LinkedHashMap.empty[String, ArrayBuffer[Seq[String]]]
    for (line0 <- text.linesIterator; line = line0.trim if line.nonEmpty) line match {
      case Line(id, w) =>
        val word = analyze(w.replace("''", "'"))
        val ws = synsets.getOrElseUpdate(id, ArrayBuffer.empty)
        if (!ws.contains(word)) ws += word
      case _ => // tolerate non-s() lines like the reference's parser skips
    }
    val b = new Builder
    for ((_, members) <- synsets if members.length > 1) {
      if (expand) for (in <- members; out <- members) b.add(in, out, includeOrig = false)
      else for (in <- members) b.add(in, members.head, includeOrig = false)
    }
    b.build()
  }

  /** An output token with the PositionLengthAttribute the plain [[Token]]
    * lacks. */
  final case class SynToken(term: String, position: Int, startOff: Int,
                            endOff: Int, posLength: Int)

  /** The SynonymFilter over a whole (pre-stop-filter) token array. */
  def filter(tokens: Array[Token], map: SynonymMap): Array[SynToken] = {
    val n = tokens.length
    // pending output words per input slot: (word, endOff or -1, posLen)
    val pending = mutable.Map.empty[Int, ArrayBuffer[(String, Int, Int)]]
    val matched = new Array[Boolean](n)
    val keepO = new Array[Boolean](n)
    var maxSlot = n - 1

    var i = 0
    while (i < n) {
      // longest rule whose input words equal the next terms (greedy, :34-47)
      val m = map.byFirst.getOrElse(tokens(i).term, Nil).find(k =>
        k.length <= n - i &&
          k.indices.forall(j => tokens(i + j).term == k(j)))
      m match {
        case Some(key) =>
          val entry = map.rules(key)
          val len = key.length
          val matchEndOff = tokens(i + len - 1).endOff
          for (out <- entry.outputs) {
            if (out.length == 1) {
              // single-output rule (:526-534)
              pending.getOrElseUpdate(i, ArrayBuffer.empty) +=
                ((out.head, matchEndOff, if (entry.keepOrig) len else 1))
            } else {
              for ((w, j) <- out.zipWithIndex) {
                pending.getOrElseUpdate(i + j, ArrayBuffer.empty) += ((w, -1, 1))
                maxSlot = math.max(maxSlot, i + j)
              }
            }
          }
          for (s <- i until (i + len)) {
            matched(s) = true
            keepO(s) |= entry.keepOrig
          }
          i += len // no parse restarts inside the match (:481)
        case None => i += 1
      }
    }

    // playback: one position per slot; kept original first, outputs at
    // the same position
    val out = ArrayBuffer.empty[SynToken]
    var pos = -1
    var slot = 0
    while (slot <= maxSlot) {
      val orig =
        if (slot < n && (!matched(slot) || keepO(slot))) Some(tokens(slot))
        else None
      val outs = pending.getOrElse(slot, ArrayBuffer.empty)
      if (orig.nonEmpty || outs.nonEmpty) {
        pos += 1
        orig.foreach(t => out += SynToken(t.term, pos, t.startOff, t.endOff, 1))
        for ((w, e, pl) <- outs) {
          val startOff = if (slot < n) tokens(slot).startOff
            else tokens(n - 1).endOff
          val endOff =
            if (e >= 0) e
            else if (slot < n) tokens(slot).endOff
            else tokens(n - 1).endOff
          out += SynToken(w, pos, startOff, endOff, pl)
        }
      }
      slot += 1
    }
    out.toArray
  }

  /** Plain-token adapter (posLength dropped) for analyzer chains. */
  def filterTokens(tokens: Array[Token], map: SynonymMap): Array[Token] =
    filter(tokens, map).map(t => Token(t.term, t.position, t.startOff, t.endOff))
}
