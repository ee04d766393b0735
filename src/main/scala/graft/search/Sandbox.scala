package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Sandbox query set (reference: /root/reference/src/
  * Lucene.Net.Sandbox/Queries/) — result-dedup filtering, the classic
  * unbounded-edit fuzzy, and multi-valued sort-field selection, each
  * re-expressed as a relational plan.
  */
object Sandbox {

  /** KeepMode (reference: DuplicateFilter.cs:229-236). */
  sealed trait KeepMode
  case object KeepFirstOccurrence extends KeepMode
  case object KeepLastOccurrence extends KeepMode

  /** DuplicateFilter (reference: Sandbox/Queries/DuplicateFilter.cs):
    * remove duplicate key-field values from search results — a doc
    * passes iff it is the FIRST/LAST docId carrying its key value over
    * the WHOLE index (not merely among the hits; the reference walks the
    * key field's postings independently of the query, then ANDs the
    * surviving bitset with the query — CorrectBits / GetDocIdSet).
    *
    * The reference's per-segment caveat ("cannot deduplicate across
    * index segments") disappears here: the keeper choice is a global
    * map-side-combinable min/max aggregation on the key — ONE shuffle of
    * (key, docId) pairs, then a broadcast-able semi-join against the
    * hits (≤ one row per distinct key). At 100 TB the aggregation is the
    * same shape as the term dictionary build — scales.
    *
    * @param keys (doc_id, key) for every live doc — the key field
    * @param hits any DataFrame with a doc_id column — the query result
    */
  def duplicateFilter(keys: DataFrame, hits: DataFrame,
      keepMode: KeepMode = KeepLastOccurrence): DataFrame = {
    val keeper = keepMode match {
      case KeepFirstOccurrence => min(col("doc_id")).as("doc_id")
      case KeepLastOccurrence => max(col("doc_id")).as("doc_id")
    }
    val keepers = keys.groupBy(col("key")).agg(keeper).select("doc_id")
    hits.join(keepers, Seq("doc_id"), "left_semi")
  }

  /** SlowFuzzyQuery term expansion (reference: Sandbox/Queries/
    * SlowFuzzyQuery.cs, SlowFuzzyTermsEnum.cs): the classic fuzzy with
    * NO edit-distance ceiling — `minSimilarity < 1` is a similarity
    * fraction, `>= 1` a raw integer edit budget. Candidates must share a
    * `prefixLength`-char literal prefix (the one pushdown the reference
    * offers — here it becomes a dictionary range SEEK conjunct parquet
    * min/max stats prune on); the residual is
    * `similarity = 1 - editsOnSuffix / (prefixLength + min(|suffixes|))`
    * `          = 1 - editsOnSuffix / min(|term|, |query|)`
    * kept iff `similarity > minSimilarity` (strict — CalcSimilarity +
    * the `similarity > MinSimilarity` accept at
    * SlowFuzzyTermsEnum.cs:139-146). Ranking = TopTermsScoringBoolean
    * rewrite order: similarity desc, term asc, truncated at
    * maxExpansions (default 50, SlowFuzzyQuery.cs:41).
    *
    * Unlike [[DictSeek.fuzzyRanges]] (the banded FuzzyQuery path) this
    * deliberately scans the whole dictionary when prefixLength == 0 —
    * that IS the operator's documented contract ("may be extremely slow,
    * comparing every term in the index"); the scan is a map-only pruned
    * projection of (term, df), never the postings.
    *
    * @return (term, df, similarity double) rows, the expansion set
    */
  def slowFuzzyTerms(termDict: DataFrame, query: String, minSimilarity: Float,
      prefixLength: Int = 0, maxExpansions: Int = 50): DataFrame = {
    require(minSimilarity >= 0f, "minimumSimilarity < 0")
    require(minSimilarity < 1f || minSimilarity == minSimilarity.toInt,
      "fractional edit distances are not allowed")
    val p = math.min(prefixLength, query.length)
    val prefix = query.substring(0, p)
    val qSuffix = query.substring(p)
    val seek: Column =
      if (p == 0) lit(true) else col("term").startsWith(prefix)
    val editsOnSuffix = levenshtein(
      expr(s"substring(term, ${p + 1})"), lit(qSuffix))
    val sim = lit(1.0) - editsOnSuffix.cast("double") /
      (lit(p) + least(length(col("term")) - lit(p), lit(qSuffix.length))).cast("double")
    val accepted =
      if (minSimilarity >= 1f) editsOnSuffix <= minSimilarity.toInt
      else sim > minSimilarity.toDouble
    termDict.where(seek && accepted)
      .select(col("term"), col("df"), sim.as("similarity"))
      .orderBy(col("similarity").desc, col("term").asc)
      .limit(maxExpansions)
  }

  /** SortedSetSortField selectors (reference: Sandbox/Queries/
    * SortedSetSortField.cs + Search/SortedSetSelector semantics): pick
    * ONE representative from a doc's multi-valued field — the value set
    * is the SORTED SET (distinct, ascending) of the array.
    *  - min / max: the ends;
    *  - middleMin / middleMax: the middle element, lower / upper of the
    *    two when the set size is even.
    * Pure column expressions — codegen'd, no UDF, no shuffle. */
  def sortedSetSelect(values: Column, selector: String): Column = {
    val sorted = array_sort(array_distinct(values))
    val n = size(sorted)
    selector match {
      case "min" => element_at(sorted, 1)
      case "max" => element_at(sorted, n)
      // set sizes are positive ints: floor(double /) is exact int division
      case "middleMin" => element_at(sorted, floor((n + lit(1)) / lit(2)).cast("int"))
      case "middleMax" => element_at(sorted, floor(n / lit(2)).cast("int") + lit(1))
      case other => throw new IllegalArgumentException(s"unknown selector: $other")
    }
  }
}
