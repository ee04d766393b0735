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
  * positions-enabled index. `raw`, when present, is the ORIGINAL quoted
  * text before analysis — the KeywordAnalyzer view a keyword-field
  * rewrite needs (MultiFieldQueryParser), since `terms` are already
  * lowercased/stopped/stemmed by the content analyzer. */
final case class PhraseQ(terms: Seq[String], slop: Int = 0, boost: Float = 1f,
    raw: Option[String] = None) extends Query

/** Phrase whose slot i accepts ANY of `slots(i)` (MultiPhraseQuery.cs);
  * slop > 0 runs the sloppy traversal over per-slot position unions. */
final case class MultiPhraseQ(slots: Seq[Seq[String]], slop: Int = 0,
                              boost: Float = 1f) extends Query

/** Exact phrase with EXPLICIT term positions — the
  * `PhraseQuery.Add(Term, position)` surface (reference:
  * Search/PhraseQuery.cs:120-147): gaps allowed, so `("ab",0), ("cd",2)`
  * matches "ab" with "cd" two positions later regardless of what sits
  * between. Requires a positions-enabled index. */
final case class SparsePhraseQ(parts: Seq[(String, Int)],
                               boost: Float = 1f) extends Query

/** NGramPhraseQuery (reference: Search/NGramPhraseQuery.cs:63-105): an
  * exact phrase whose terms are CONSECUTIVE n-grams of one surface
  * string. Because adjacent grams overlap by n-1 characters, matching
  * every n-th gram (plus the last) implies the skipped grams match too —
  * so the optimized query decodes ~1/n of the posting lists for the same
  * result set. `optimized` applies the reference's exact rewrite rule:
  * keep positions p where `p % n == 0 || p == last`; phrases too short
  * to optimize (n < 2 or fewer than 3 grams) fall back to the plain
  * phrase, exactly like the reference's base.Rewrite. */
final case class NGramPhraseQ(n: Int, terms: Seq[String],
                              boost: Float = 1f) extends Query {
  def optimized: Query =
    if (n < 2 || terms.length < 3) PhraseQ(terms, 0, boost)
    else {
      val lastPos = terms.length - 1
      SparsePhraseQ(terms.zipWithIndex.collect {
        case (t, p) if p % n == 0 || p >= lastPos => (t, p)
      }, boost)
    }
}

/** Phrase whose parts may be multi-term sub-queries — `"merg* table"~2`
  * (reference: QueryParsers/ComplexPhrase/ComplexPhraseQueryParser.cs):
  * rewrite expands each multi-term part against the dictionary into a
  * [[MultiPhraseQ]] slot. */
final case class ComplexPhraseQ(parts: Seq[Query], slop: Int = 0,
                                boost: Float = 1f) extends Query

/** Score-function expression over a sub-query's score and per-doc values
  * (reference: Queries/Function/ValueSources/ — the 45 ValueSource
  * classes reduce to this vocabulary for scoring purposes; the reference
  * composes them as an expression tree exactly like this ADT). Evaluated
  * per hit inside the distributed scan — never on the driver. */
sealed trait ScoreExpr
object ScoreExpr {
  /** The wrapped query's own score (CustomScoreQuery's subQueryScore). */
  case object SubScore extends ScoreExpr
  /** Exact document length in tokens (≙ a stored numeric ValueSource —
    * the docstats tokenCount, not the lossy norm byte). */
  case object DocLen extends ScoreExpr
  final case class Const(v: Float) extends ScoreExpr
  final case class Add(a: ScoreExpr, b: ScoreExpr) extends ScoreExpr
  final case class Mul(a: ScoreExpr, b: ScoreExpr) extends ScoreExpr
  final case class Div(a: ScoreExpr, b: ScoreExpr) extends ScoreExpr
  final case class Log1p(a: ScoreExpr) extends ScoreExpr
  final case class Pow(a: ScoreExpr, e: Float) extends ScoreExpr
  /** a/(m·x + b) — ReciprocalFloatFunction.cs:52 (their (m, a, b)
    * constructor order), the classic recency/length decay. */
  final case class Reciprocal(x: ScoreExpr, m: Float, a: Float, b: Float) extends ScoreExpr
  /** slope·x + intercept — LinearFloatFunction.cs:38; also the resolved
    * form of ScaleFloatFunction (see ValueSources.scaleDocLen). */
  final case class Linear(x: ScoreExpr, slope: Float, intercept: Float) extends ScoreExpr
  /** x ∈ [lo, hi] → target else default — RangeMapFloatFunction.cs:43. */
  final case class RangeMap(x: ScoreExpr, lo: Float, hi: Float,
                            target: Float, default: Float) extends ScoreExpr
  /** MaxFloatFunction.cs / MinFloatFunction.cs. */
  final case class MaxOf(a: ScoreExpr, b: ScoreExpr) extends ScoreExpr
  final case class MinOf(a: ScoreExpr, b: ScoreExpr) extends ScoreExpr

  def eval(expr: ScoreExpr, subScore: Float, docLen: Float): Float = expr match {
    case SubScore => subScore
    case DocLen => docLen
    case Const(v) => v
    case Add(a, b) => eval(a, subScore, docLen) + eval(b, subScore, docLen)
    case Mul(a, b) => eval(a, subScore, docLen) * eval(b, subScore, docLen)
    case Div(a, b) => eval(a, subScore, docLen) / eval(b, subScore, docLen)
    case Log1p(a) => math.log1p(eval(a, subScore, docLen)).toFloat
    case Pow(a, e) => math.pow(eval(a, subScore, docLen), e).toFloat
    case Reciprocal(x, m, a, b) => a / (m * eval(x, subScore, docLen) + b)
    case Linear(x, s, i) => s * eval(x, subScore, docLen) + i
    case RangeMap(x, lo, hi, t, d) =>
      val v = eval(x, subScore, docLen); if (v >= lo && v <= hi) t else d
    case MaxOf(a, b) => math.max(eval(a, subScore, docLen), eval(b, subScore, docLen))
    case MinOf(a, b) => math.min(eval(a, subScore, docLen), eval(b, subScore, docLen))
  }
}

/** Score rewiring: hits are the sub-query's hits, score = expr(subScore,
  * doc values) — "relevance × recency/length prior" without leaving the
  * engine API (reference: Queries/CustomScoreQuery.cs:338-345, whose
  * CustomScore(doc, subQueryScore, valSrcScore) is exactly this hook). */
final case class FunctionScoreQ(q: Query, expr: ScoreExpr) extends Query

/** Demote (or promote) hits that also match `context`: match scores
  * normally, then × contextBoost iff the doc matches context; context
  * alone never produces a hit (reference: Queries/BoostingQuery.cs:49-77,
  * implemented there as a 0-boost SHOULD clause + per-doc multiplier). */
final case class BoostingQ(positive: Query, context: Query,
                           contextBoost: Float) extends Query

/** A scored hit; ordering contract = score desc, then docId asc
  * (reference: Search/HitQueue.cs:82-91). */
final case class ScoreDoc(docId: Long, score: Float)

/** TopDocs analog (Search/TopDocs.cs). */
final case class TopDocs(totalHits: Long, scoreDocs: Array[ScoreDoc])
