package graft.search

/** Query ADT (≙ the reference's Query tree, reference:
  * /root/reference/src/Lucene.Net/Search/Query.cs and BooleanQuery.cs).
  * Plans are built programmatically from Scala — the reference's fixpoint
  * Rewrite (IndexSearcher.cs:667-670) becomes constructor-time
  * simplification in the plan builder (SURVEY.md §4). */
sealed trait Query

/** Point lookup + scored posting scan (TermQuery.cs:56-106). */
final case class TermQ(term: String, boost: Float = 1f) extends Query

/** MUST = docId equi-join, SHOULD = union+sum, MUST_NOT = anti-join,
  * minShouldMatch = count>=m predicate (ConjunctionScorer /
  * DisjunctionSumScorer / ReqExclScorer / MinShouldMatchSumScorer). */
final case class BoolQ(
    must: Seq[Query] = Nil,
    should: Seq[Query] = Nil,
    mustNot: Seq[Query] = Nil,
    minShouldMatch: Int = 0,
    boost: Float = 1f) extends Query

/** score := boost, sub-scores dropped (ConstantScoreQuery.cs:96). */
final case class ConstantScoreQ(q: Query, boost: Float = 1f) extends Query

/** per-doc max + tieBreak * (sum - max) (DisjunctionMaxQuery.cs). */
final case class DisMaxQ(queries: Seq[Query], tieBreak: Float = 0f) extends Query

/** Full scan, score = boost (MatchAllDocsQuery.cs). */
final case class MatchAllQ(boost: Float = 1f) extends Query

/** Multi-term queries: term-dictionary scan → expand to an OR of terms
  * (MultiTermQuery.cs rewrite family). Expansion is capped at
  * maxExpansions (≙ BooleanQuery.MaxClauseCount = 1024,
  * BooleanQuery.cs:71). */
final case class PrefixQ(prefix: String, boost: Float = 1f) extends Query
final case class WildcardQ(pattern: String, boost: Float = 1f) extends Query
final case class RegexpQ(regex: String, boost: Float = 1f) extends Query
final case class FuzzyQ(term: String, maxEdits: Int = 2, boost: Float = 1f) extends Query
final case class TermRangeQ(lower: String, upper: String,
    includeLower: Boolean = true, includeUpper: Boolean = true,
    boost: Float = 1f) extends Query

/** Exact phrase over positions (ExactPhraseScorer semantics); requires a
  * positions-enabled index. */
final case class PhraseQ(terms: Seq[String], slop: Int = 0, boost: Float = 1f) extends Query

/** Phrase whose slot i accepts ANY of `slots(i)` (MultiPhraseQuery.cs);
  * slop > 0 runs the sloppy traversal over per-slot position unions. */
final case class MultiPhraseQ(slots: Seq[Seq[String]], slop: Int = 0,
                              boost: Float = 1f) extends Query

/** Phrase whose parts may be multi-term sub-queries — `"merg* table"~2`
  * (reference: QueryParsers/ComplexPhrase/ComplexPhraseQueryParser.cs):
  * rewrite expands each multi-term part against the dictionary into a
  * [[MultiPhraseQ]] slot. */
final case class ComplexPhraseQ(parts: Seq[Query], slop: Int = 0,
                                boost: Float = 1f) extends Query

/** A scored hit; ordering contract = score desc, then docId asc
  * (reference: Search/HitQueue.cs:82-91). */
final case class ScoreDoc(docId: Long, score: Float)

/** TopDocs analog (Search/TopDocs.cs). */
final case class TopDocs(totalHits: Long, scoreDocs: Array[ScoreDoc])
