package graft.search

import graft.analysis.Analyzer

/** Fragment highlighter (≙ reference:
  * /root/reference/src/Lucene.Net.Highlighter/Highlight/Highlighter.cs +
  * QueryScorer.cs, re-thought): re-analyze the document, slide a
  * token-window over it, pick the window with the most query-term hits
  * (ties → earliest), and mark the matched terms in the ORIGINAL text
  * using the tokens' stored offsets. Runs per-row inside whatever Spark
  * op carries it (typed map over the hits⨝docs join — highlighters only
  * ever touch the already-retrieved top-k docs, so this is driver-free,
  * shuffle-free decoration work). */
object Highlighter {

  final case class Fragment(text: String, hits: Int)

  def bestFragment(analyzer: Analyzer, content: String, queryTerms: Set[String],
                   windowTokens: Int = 12,
                   preTag: String = "<b>", postTag: String = "</b>"): Option[Fragment] = {
    val toks = analyzer.analyze(content).tokens
    if (toks.isEmpty) return None
    val isHit = toks.map(t => queryTerms.contains(t.term))
    if (!isHit.contains(true)) return None
    // best window by hit count (two-pointer), earliest on ties
    var best = 0
    var bestHits = -1
    var run = 0
    var i = 0
    while (i < toks.length) {
      if (isHit(i)) run += 1
      if (i >= windowTokens && isHit(i - windowTokens)) run -= 1
      val start = math.max(0, i - windowTokens + 1)
      if (i >= windowTokens - 1 || i == toks.length - 1) {
        if (run > bestHits) { bestHits = run; best = start }
      }
      i += 1
    }
    val end = math.min(toks.length - 1, best + windowTokens - 1)
    val fragStart = toks(best).startOff
    val fragEnd = toks(end).endOff
    // mark hits inside the fragment, back-to-front so offsets stay valid
    val sb = new StringBuilder(content.substring(fragStart, fragEnd))
    var j = end
    while (j >= best) {
      if (isHit(j)) {
        sb.insert(toks(j).endOff - fragStart, postTag)
        sb.insert(toks(j).startOff - fragStart, preTag)
      }
      j -= 1
    }
    Some(Fragment(sb.toString, bestHits))
  }
}
